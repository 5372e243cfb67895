/* Zero-egress fallback viewer.
 *
 * The primary viewer renders with three.js from a CDN importmap; deploys
 * without network egress can't load it. This module is entirely
 * self-contained (no imports) and renders the same /api/state feed on a
 * plain 2D canvas: xy-projected gradient bodies with trails, 1 Hz polling
 * with client-side lerp, click-to-focus via the body list, hover tooltips,
 * and the search/sort HUD — so the app remains fully usable offline.
 */

const POLL_MS = 1000;
const TRAIL_MAX = 1500;

const PALETTE = ["#ffd27d", "#9ec5ff", "#ff9e80", "#b3e5a1", "#e1b3ff",
                 "#80deea", "#ffab91", "#fff59d", "#c5cae9", "#f48fb1"];
const colorFor = (name) => {
  if (name === "Sol") return "#ffd75e";
  let h = 0;
  for (const ch of name) h = (h * 31 + ch.charCodeAt(0)) >>> 0;
  return PALETTE[h % PALETTE.length];
};

export function startFallback(boot) {
  const container = document.getElementById("scene");
  const canvas = document.createElement("canvas");
  container.appendChild(canvas);
  const ctx = canvas.getContext("2d");

  const note = document.createElement("div");
  note.className = "hud";
  note.style.cssText = "bottom:12px;left:50%;transform:translateX(-50%);opacity:.75;";
  note.textContent = "2D fallback renderer (three.js CDN unreachable)";
  document.body.appendChild(note);

  // static starfield (view-fixed, regenerated on resize)
  let stars = [];
  function resize() {
    canvas.width = innerWidth * devicePixelRatio;
    canvas.height = innerHeight * devicePixelRatio;
    canvas.style.width = innerWidth + "px";
    canvas.style.height = innerHeight + "px";
    stars = Array.from({ length: 220 }, () => [
      Math.random() * canvas.width, Math.random() * canvas.height,
      Math.random() * 1.4 + 0.3]);
  }
  resize();
  addEventListener("resize", resize);

  const bodies = new Map(); // id -> {info, prev, next, cur, t0, trail, color}
  let snapshot = boot.snapshot || { bodies: [] };
  let focusId = null;
  let scaleM = 1e-9;   // meters -> px, set by frame()
  let zoom = 1;
  let flashUntil = 0;

  function frame() {
    let far = 1;
    for (const b of snapshot.bodies) {
      const p = b.position;
      far = Math.max(far, Math.hypot(p.x, p.y, p.z));
    }
    scaleM = (0.45 * Math.min(canvas.width, canvas.height)) / far;
  }

  function ingest(snap, seed) {
    snapshot = snap;
    const seen = new Set();
    for (const info of snap.bodies) {
      seen.add(info.id);
      let b = bodies.get(info.id);
      if (!b) {
        const p = { x: info.position.x, y: info.position.y };
        b = { info, prev: { ...p }, next: { ...p }, cur: { ...p },
              t0: performance.now(), trail: [], color: colorFor(info.name) };
        bodies.set(info.id, b);
        const hist = seed && boot.history && boot.history[info.name];
        if (hist) for (const q of hist.slice(-TRAIL_MAX)) b.trail.push([q[0], q[1]]);
      } else {
        b.info = info;
        b.prev = { ...b.cur };
        b.next = { x: info.position.x, y: info.position.y };
        b.t0 = performance.now();
        b.trail.push([b.next.x, b.next.y]);
        if (b.trail.length > TRAIL_MAX) b.trail.shift();
      }
    }
    for (const [id, b] of bodies) if (!seen.has(id)) bodies.delete(id);
    updateTime(snap);
    renderList();
  }

  function updateTime(snap) {
    const d = document.getElementById("simdate");
    if (d) d.textContent = (snap.sim_time_iso || "").replace("T", " ").slice(0, 19) + " UTC";
    const e = document.getElementById("simelapsed");
    if (e && snap.sim_time_jd) {
      e.textContent = `elapsed ${(snap.time_elapsed / 86400).toFixed(1)} days · JD ${snap.sim_time_jd.toFixed(2)}`;
    }
  }

  const searchEl = document.getElementById("search");
  const sortEl = document.getElementById("sort");
  if (searchEl) searchEl.addEventListener("input", renderList);
  if (sortEl) sortEl.addEventListener("change", renderList);
  const clearEl = document.getElementById("clearfocus");
  if (clearEl) clearEl.addEventListener("click", () => { focusId = null; zoom = 1; renderList(); });
  const flashEl = document.getElementById("flash");
  if (flashEl) flashEl.addEventListener("click", () => { flashUntil = performance.now() + 1500; });
  addEventListener("keydown", (ev) => { if (ev.key === "Escape") { focusId = null; zoom = 1; renderList(); } });
  addEventListener("wheel", (ev) => {
    zoom = Math.min(1e6, Math.max(0.2, zoom * Math.exp(-ev.deltaY * 0.001)));
  });

  function renderList() {
    const ul = document.getElementById("bodylist");
    if (!ul) return;
    const q = searchEl ? searchEl.value.trim().toLowerCase() : "";
    const mode = sortEl ? sortEl.value : "name";
    const rows = snapshot.bodies
      .filter((b) => !q || b.name.toLowerCase().includes(q))
      .sort((a, b) => {
        if (mode === "radius") return b.radius_km - a.radius_km;
        if (mode === "dist") {
          const d = (p) => Math.hypot(p.position.x, p.position.y, p.position.z);
          return d(a) - d(b);
        }
        return a.name.localeCompare(b.name);
      });
    ul.innerHTML = "";
    for (const b of rows) {
      const li = document.createElement("li");
      if (b.id === focusId) li.classList.add("focused");
      const au = Math.hypot(b.position.x, b.position.y, b.position.z) / 1.495978707e11;
      li.innerHTML = `<span>${b.name}</span><small>${au.toFixed(2)} AU</small>`;
      li.addEventListener("click", () => { focusId = b.id; zoom = Math.max(zoom, 4); renderList(); });
      ul.appendChild(li);
    }
  }

  // hover tooltip: nearest drawn body within 18 px
  const tooltip = document.getElementById("tooltip");
  let drawPos = new Map(); // id -> [px, py, r]
  addEventListener("pointermove", (ev) => {
    if (!tooltip) return;
    const mx = ev.clientX * devicePixelRatio, my = ev.clientY * devicePixelRatio;
    let best = null, bestD = 18 * devicePixelRatio;
    for (const [id, [px, py]] of drawPos) {
      const d = Math.hypot(px - mx, py - my);
      if (d < bestD) { best = id; bestD = d; }
    }
    if (best === null) { tooltip.style.display = "none"; return; }
    const b = bodies.get(best).info;
    const au = Math.hypot(b.position.x, b.position.y, b.position.z) / 1.495978707e11;
    tooltip.innerHTML = `<b>${b.name}</b><br>radius ${b.radius_km.toLocaleString()} km<br>` +
      `mass ${b.mass_kg.toExponential(3)} kg<br>dist ${au.toFixed(3)} AU`;
    tooltip.style.display = "block";
    tooltip.style.left = `${ev.clientX + 14}px`;
    tooltip.style.top = `${ev.clientY + 14}px`;
  });

  function sizePx(info) {
    const { radius_min: r0, radius_max: r1 } = snapshot;
    const t = (Math.log(info.radius_km || 1) - Math.log(r0 || 1)) /
              Math.max(1e-9, Math.log(r1 || 2) - Math.log(r0 || 1));
    return (3 + t * 10) * devicePixelRatio;
  }

  function draw() {
    requestAnimationFrame(draw);
    const now = performance.now();
    const w = canvas.width, h = canvas.height;
    ctx.fillStyle = "#01030a";
    ctx.fillRect(0, 0, w, h);
    ctx.fillStyle = "#334455";
    for (const [sx, sy, sr] of stars) ctx.fillRect(sx, sy, sr, sr);

    // lerp positions; origin follows focus
    for (const b of bodies.values()) {
      const t = Math.min(1, (now - b.t0) / POLL_MS);
      b.cur.x = b.prev.x + (b.next.x - b.prev.x) * t;
      b.cur.y = b.prev.y + (b.next.y - b.prev.y) * t;
    }
    const fb = focusId !== null ? bodies.get(focusId) : null;
    const ox = fb ? fb.cur.x : 0, oy = fb ? fb.cur.y : 0;
    const s = scaleM * zoom;
    const X = (mx) => w / 2 + (mx - ox) * s;
    const Y = (my) => h / 2 - (my - oy) * s;

    drawPos = new Map();
    for (const b of bodies.values()) {
      // trail
      if (b.trail.length > 1) {
        ctx.strokeStyle = b.color + "55";
        ctx.lineWidth = devicePixelRatio;
        ctx.beginPath();
        ctx.moveTo(X(b.trail[0][0]), Y(b.trail[0][1]));
        for (const q of b.trail) ctx.lineTo(X(q[0]), Y(q[1]));
        ctx.stroke();
      }
      const px = X(b.cur.x), py = Y(b.cur.y);
      if (px < -50 || px > w + 50 || py < -50 || py > h + 50) continue;
      let r = sizePx(b.info);
      if (now < flashUntil) r *= 1 + 0.8 * Math.abs(Math.sin((flashUntil - now) / 120));
      const grad = ctx.createRadialGradient(px, py, r * 0.1, px, py, r);
      grad.addColorStop(0, "#ffffff");
      grad.addColorStop(0.35, b.color);
      grad.addColorStop(1, "rgba(0,0,0,0)");
      ctx.fillStyle = grad;
      ctx.beginPath();
      ctx.arc(px, py, r, 0, Math.PI * 2);
      ctx.fill();
      drawPos.set(b.info.id, [px, py, r]);
    }
  }

  async function poll() {
    try {
      const res = await fetch("/api/state");
      if (res.ok) ingest(await res.json(), false);
    } catch (err) { /* server restarting; keep lerping */ }
    setTimeout(poll, POLL_MS);
  }

  ingest(snapshot, true);
  frame();
  draw();
  poll();
}
