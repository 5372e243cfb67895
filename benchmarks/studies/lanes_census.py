"""Padded pair-lane census: columns-mode classes vs pairs-mode octaves
(z-trimmed). Counts the pair SLOTS each sweep pads over — the compute
cost proxy (each slot is ~17 VPU ops)."""
import sys; sys.path.insert(0, '/root/repo')
import numpy as np
from bench import make_plummer

def census(n, levels, ws=1, C=32):
    M = 2 ** levels
    pos, _, _ = make_plummer(n)
    lo, hi = pos.min(0), pos.max(0)
    center = (lo + hi) / 2; half = (hi - lo).max() / 2 * 1.0001
    h = 2 * half / M
    cc = np.clip(np.floor((pos - (center - half)) / h).astype(int), 0, M - 1)
    cid = (cc[:, 0] * M + cc[:, 1]) * M + cc[:, 2]
    sc = np.sort(cid)
    col = sc // M
    z = sc % M
    ucols, starts, counts = np.unique(col, return_index=True,
                                      return_counts=True)
    cmap = dict(zip(ucols.tolist(), range(len(ucols))))
    cap = counts.max()
    cpc = -(-counts // C)

    def nbrs(c):
        cx, cy = divmod(int(c), M)
        out = []
        for a in range(-ws, ws + 1):
            for b in range(-ws, ws + 1):
                if 0 <= cx + a < M and 0 <= cy + b < M:
                    nc = (cx + a) * M + cy + b
                    if nc in cmap:
                        out.append(cmap[nc])
        return out

    # ---- columns mode ----
    big = counts > C
    anybig = np.zeros(len(ucols), bool)
    for i, c in enumerate(ucols):
        anybig[i] = any(big[j] for j in nbrs(c))
    small = ~big & ~anybig
    frontier = ~big & anybig
    lanes_cols = (small.sum() * C * 9 * C
                  + frontier.sum() * C * 9 * cap
                  + sum(-(-counts[i] // C) for i in np.where(big)[0])
                  * C * 9 * cap)

    # ---- pairs mode (z-trimmed octave widths) ----
    # per-column chunk z ranges
    zr = {}
    for i, (s, c_) in enumerate(zip(starts, counts)):
        zs = z[s:s + c_]
        zr[i] = [(zs[k], zs[min(k + C - 1, c_ - 1)])
                 for k in range(0, c_, C)]
    lanes_pairs = 0
    true_slots = 0
    for i in range(len(ucols)):
        nb = nbrs(ucols[i])
        for (zl, zh) in zr[i]:
            S = 0
            for j in nb:
                for (jl, jh) in zr[j]:
                    if jh >= zl - ws and jl <= zh + ws:
                        S += 1
            true_slots += S
            W = 9
            while W < S:
                W *= 2
            lanes_pairs += C * W * C
    print(f"n={n} l{levels}: cap={cap} "
          f"columns lanes={lanes_cols/1e9:.2f}G "
          f"pairs lanes={lanes_pairs/1e9:.2f}G "
          f"(true chunk slots {true_slots*C*C/1e9:.2f}G) "
          f"ratio={lanes_cols/lanes_pairs:.1f}x")

census(65536, 7)
census(262144, 8)
census(1048576, 8)
