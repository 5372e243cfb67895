"""Example presets and offline visualization."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from orbital_tpu.models.examples import (
    sol_from_kepler_dataset,
    sun_earth_moon,
    three_body_equilateral,
    two_body_problem,
)
from orbital_tpu.viz.plot import plot_orbits, plot_trajectory
from orbital_tpu.viz.video import render_orbital_mp4


def test_two_body_problem_runs(capsys):
    eng = two_body_problem(steps=100, show=False)
    assert eng.step_idx == 100
    assert "dE=" in capsys.readouterr().out


def test_sun_earth_moon_conserves(capsys):
    eng = sun_earth_moon(steps=300, show=False)
    out = capsys.readouterr().out
    drifts = [abs(float(line.split("dE=")[1].split(",")[0]))
              for line in out.splitlines() if "dE=" in line]
    assert max(drifts) < 1e-9


def test_three_body_equilateral_symmetric():
    eng = three_body_equilateral(steps=500, render=False)
    # rigid rotation: pairwise distances stay near sqrt(3) R
    pos = np.stack([o.position() for o in eng.objects])
    d01 = np.linalg.norm(pos[0] - pos[1])
    d12 = np.linalg.norm(pos[1] - pos[2])
    assert d01 == pytest.approx(np.sqrt(3) * 1e7, rel=1e-3)
    assert d12 == pytest.approx(d01, rel=1e-3)


def test_sol_from_kepler_dataset_runs():
    eng = sol_from_kepler_dataset(days=10, render=False, print_every=5)
    assert len(eng.objects) == 15
    assert eng.time_elapsed == pytest.approx(10 * 86400.0)


def test_plot_orbits_saves(tmp_path):
    eng = two_body_problem(steps=50, show=False)
    out = tmp_path / "orbits.png"
    fig, axes = plot_orbits(eng, every_n=2, plane="xz", last_k=20,
                            separate=True, barycenter_trail=True,
                            savepath=str(out), show=False)
    assert out.exists() and out.stat().st_size > 0
    with pytest.raises(ValueError):
        plot_orbits(eng, plane="ab", show=False)


def test_plot_trajectory_from_device_buffer(tmp_path):
    import orbital_tpu as ot
    from orbital_tpu.engine.state import make_state

    rng = np.random.default_rng(0)
    st = make_state(rng.normal(size=(4, 3)), rng.normal(size=(4, 3)) * 0.1,
                    rng.uniform(0.5, 1, 4), precision="f64")
    cfg = ot.SimConfig(dt=0.01, G=1.0)
    st = ot.init_forces(st, cfg)
    _, traj = ot.rollout_jit(st, cfg, 50, record_every=5)
    out = tmp_path / "traj.png"
    plot_trajectory(traj, names=list("abcd"), masses=np.ones(4),
                    savepath=str(out), show=False)
    assert out.exists()


def test_render_video_fallback_or_stitch(tmp_path):
    # without ffmpeg this writes frames + prints the fallback; with ffmpeg it
    # stitches — both paths must succeed
    eng = two_body_problem(steps=60, show=False)
    info = render_orbital_mp4(eng, out_path=str(tmp_path / "v.mp4"), fps=5,
                              duration_s=1.0, tmp_dir=str(tmp_path / "frames"),
                              cleanup=False)
    assert info["frames"] >= 1
    import os

    frames = os.listdir(tmp_path / "frames")
    assert any(f.endswith(".png") for f in frames)
    if info["ffmpeg"]:
        assert info["stitched"] and (tmp_path / "v.mp4").exists()


def test_plot_trajectory_masks_dead_bodies(tmp_path, rng):
    """Far-parked dead bodies (merges/padding) must not blow up the plot:
    their records NaN out, never-alive padding rows drop entirely."""
    import matplotlib
    matplotlib.use("Agg")
    import orbital_tpu as ot
    from orbital_tpu.engine.state import make_state
    from orbital_tpu.viz.plot import plot_trajectory

    pos = np.array([[-0.5, 0, 0], [0.5, 0, 0], [0, 8.0, 0]])
    vel = np.array([[0.2, 0, 0], [-0.2, 0, 0], [0, 0, 0]])
    mass = np.array([2.0, 1.0, 1e-3])
    radius = np.array([0.2, 0.2, 0.01])
    st = make_state(pos, vel, mass, radius, precision="f32", pad_to=4)
    cfg = ot.SimConfig(dt=0.1, G=1e-6, eps2=1e-8, collisions="merge",
                       force_impl="dense")
    st = ot.init_forces(st, cfg)
    fin, traj = ot.rollout_jit(st, cfg, 60, record_every=10)
    assert not np.asarray(fin.alive)[1]  # merge happened

    out = tmp_path / "merged.png"
    fig, axes = plot_trajectory(traj, masses=np.asarray(fin.mass),
                                savepath=str(out), show=False)
    # axis limits must stay on the live scene, not the 1e8-scale parking
    xlo, xhi = axes[0].get_xlim()
    assert abs(xlo) < 100 and abs(xhi) < 100
    assert out.exists()
