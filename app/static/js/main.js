/* orbital-tpu live viewer.
 *
 * Renders the /api/state feed (meters) as a three.js scene: gradient-sprite
 * bodies with polyline trails, 1 Hz polling with client-side lerp between
 * samples, a focus system (origin + zoom follow a chosen body), hover
 * tooltips, and a searchable/sortable body list.
 *
 * Coordinate model: world = (meters - origin) * scale * zoomBoost, where
 * `origin` eases toward the focused body (Sol by default) and `zoomBoost`
 * grows as the camera closes in on a focused body, so moon systems become
 * explorable without breaking float precision at solar-system extents.
 */
// three.js loads from the CDN importmap; without egress we degrade to the
// self-contained 2D canvas viewer (fallback2d.js — no external deps), so
// zero-egress deploys still get a live, interactive scene.
let THREE, OrbitControls;
try {
  THREE = await import("three");
  ({ OrbitControls } = await import("three/addons/controls/OrbitControls.js"));
} catch (err) {
  const { startFallback } = await import("./fallback2d.js");
  startFallback(window.__BOOTSTRAP__ || { history: {}, snapshot: { bodies: [] } });
  throw err;  // stop the 3D module; the fallback owns the page now
}

const POLL_MS = 1000;
const TRAIL_MAX = 4000;
const WORLD_RADIUS = 500;         // farthest body lands at this world distance
const SPRITE_PX = { min: 4, max: 26 };

const boot = window.__BOOTSTRAP__ || { history: {}, snapshot: { bodies: [] } };

// ---------- scene scaffolding ----------
const container = document.getElementById("scene");
const renderer = new THREE.WebGLRenderer({ antialias: true });
renderer.setPixelRatio(window.devicePixelRatio);
renderer.setSize(innerWidth, innerHeight);
container.appendChild(renderer.domElement);

const scene = new THREE.Scene();
scene.background = new THREE.Color(0x01030a);
const camera = new THREE.PerspectiveCamera(55, innerWidth / innerHeight, 0.01, 1e7);
camera.position.set(0, -WORLD_RADIUS * 1.6, WORLD_RADIUS * 0.9);
camera.up.set(0, 0, 1);
const controls = new OrbitControls(camera, renderer.domElement);
controls.enableDamping = true;

// faint starfield
{
  const pts = new Float32Array(3 * 1500);
  for (let i = 0; i < pts.length; i++) pts[i] = (Math.random() - 0.5) * 2e4;
  const g = new THREE.BufferGeometry();
  g.setAttribute("position", new THREE.BufferAttribute(pts, 3));
  scene.add(new THREE.Points(g, new THREE.PointsMaterial({ color: 0x334455, size: 1.5, sizeAttenuation: false })));
}

function makeSpriteTexture(color) {
  const c = document.createElement("canvas");
  c.width = c.height = 64;
  const ctx = c.getContext("2d");
  const grad = ctx.createRadialGradient(32, 32, 2, 32, 32, 30);
  grad.addColorStop(0, "#ffffff");
  grad.addColorStop(0.25, color);
  grad.addColorStop(1, "rgba(0,0,0,0)");
  ctx.fillStyle = grad;
  ctx.fillRect(0, 0, 64, 64);
  return new THREE.CanvasTexture(c);
}

const PALETTE = ["#ffd27d", "#9ec5ff", "#ff9e80", "#b3e5a1", "#e1b3ff",
                 "#80deea", "#ffab91", "#fff59d", "#c5cae9", "#f48fb1"];
const colorFor = (name) => {
  if (name === "Sol") return "#ffd75e";
  let h = 0;
  for (const ch of name) h = (h * 31 + ch.charCodeAt(0)) >>> 0;
  return PALETTE[h % PALETTE.length];
};

// ---------- coordinate transform ----------
const xform = {
  scale: 1e-9,                      // meters -> world, set on first frame
  origin: new THREE.Vector3(),      // meters; eases toward focus target
  targetOrigin: new THREE.Vector3(),
  boost: 1,
  targetBoost: 1,
};
function toWorld(m, out) {
  return out.set(
    (m.x - xform.origin.x) * xform.scale * xform.boost,
    (m.y - xform.origin.y) * xform.scale * xform.boost,
    (m.z - xform.origin.z) * xform.scale * xform.boost,
  );
}

// ---------- bodies ----------
class BodyView {
  constructor(info) {
    this.id = info.id;
    this.name = info.name;
    this.info = info;
    this.color = colorFor(info.name);
    // lerp state in meters
    this.prev = new THREE.Vector3(info.position.x, info.position.y, info.position.z);
    this.next = this.prev.clone();
    this.lerpStart = performance.now();
    this.meters = this.prev.clone();

    this.twinklePhase = Math.random() * Math.PI * 2;
    this.sprite = new THREE.Sprite(new THREE.SpriteMaterial({
      map: makeSpriteTexture(this.color), transparent: true, depthWrite: false,
    }));
    this.sprite.userData.body = this;
    scene.add(this.sprite);

    this.trailMeters = [];           // ring buffer of Vector3 (meters)
    const positions = new Float32Array(TRAIL_MAX * 3);
    this.trailGeom = new THREE.BufferGeometry();
    this.trailGeom.setAttribute("position", new THREE.BufferAttribute(positions, 3));
    this.trailGeom.setDrawRange(0, 0);
    this.trailLine = new THREE.Line(this.trailGeom, new THREE.LineBasicMaterial({
      color: new THREE.Color(this.color), transparent: true, opacity: 0.45,
    }));
    this.trailLine.frustumCulled = false;
    scene.add(this.trailLine);
  }

  seedTrail(points) {
    for (const p of points.slice(-TRAIL_MAX)) {
      this.trailMeters.push(new THREE.Vector3(p[0], p[1], p[2]));
    }
  }

  setTarget(pos) {
    this.prev.copy(this.meters);
    this.next.set(pos.x, pos.y, pos.z);
    this.lerpStart = performance.now();
    this.trailMeters.push(this.next.clone());
    if (this.trailMeters.length > TRAIL_MAX) this.trailMeters.shift();
  }

  update(now, sizeScale) {
    const t = Math.min(1, (now - this.lerpStart) / POLL_MS);
    this.meters.lerpVectors(this.prev, this.next, t);
    toWorld(this.meters, this.sprite.position);
    let s = sizeScale(this.info);
    // twinkle: subtle per-body shimmer; flash: strong pulse on demand
    const phase = now / 900 + this.twinklePhase;
    this.sprite.material.opacity = 0.92 + 0.08 * Math.sin(phase);
    if (now < flashUntil) {
      const pulse = 1 + 0.8 * Math.abs(Math.sin((flashUntil - now) / 120));
      s *= pulse;
      this.sprite.material.opacity = 1.0;
    }
    this.sprite.scale.set(s, s, 1);

    const attr = this.trailGeom.getAttribute("position");
    const v = new THREE.Vector3();
    const n = this.trailMeters.length;
    for (let i = 0; i < n; i++) {
      toWorld(this.trailMeters[i], v);
      attr.setXYZ(i, v.x, v.y, v.z);
    }
    attr.needsUpdate = true;
    this.trailGeom.setDrawRange(0, n);
  }

  dispose() {
    scene.remove(this.sprite);
    scene.remove(this.trailLine);
  }
}

const views = new Map();   // id -> BodyView
let snapshot = boot.snapshot;
let focusId = null;
let flashUntil = 0;        // flash effect: bodies pulse until this timestamp

function sizeScale(info) {
  // log-scale radius into pixel-ish sprite sizes, then convert to world
  const { radius_min: r0, radius_max: r1 } = snapshot;
  const t = (Math.log(info.radius_km) - Math.log(r0 || 1)) /
            Math.max(1e-9, Math.log(r1 || 2) - Math.log(r0 || 1));
  const px = SPRITE_PX.min + t * (SPRITE_PX.max - SPRITE_PX.min);
  const dist = camera.position.length() || WORLD_RADIUS;
  return (px / innerHeight) * dist * 0.9;
}

function ingest(snap, seedHistory) {
  snapshot = snap;
  const seen = new Set();
  for (const info of snap.bodies) {
    seen.add(info.id);
    let view = views.get(info.id);
    if (!view) {
      view = new BodyView(info);
      views.set(info.id, view);
      if (seedHistory && boot.history[info.name]) view.seedTrail(boot.history[info.name]);
    } else {
      view.info = info;
      view.setTarget(info.position);
    }
  }
  for (const [id, view] of views) {
    if (!seen.has(id)) { view.dispose(); views.delete(id); }  // merged away
  }
  updateTime(snap);
  renderList();
}

// first frame: pick a scale that puts the farthest body at WORLD_RADIUS
function frameScene() {
  let far = 1;
  for (const b of snapshot.bodies) {
    const p = b.position;
    far = Math.max(far, Math.hypot(p.x, p.y, p.z));
  }
  xform.scale = WORLD_RADIUS / far;
}

// ---------- HUD: time, list, tooltip ----------
function updateTime(snap) {
  document.getElementById("simdate").textContent =
    (snap.sim_time_iso || "").replace("T", " ").slice(0, 19) + " UTC";
  document.getElementById("simelapsed").textContent =
    `elapsed ${(snap.time_elapsed / 86400).toFixed(1)} days · JD ${snap.sim_time_jd.toFixed(2)}`;
}

const searchEl = document.getElementById("search");
const sortEl = document.getElementById("sort");
searchEl.addEventListener("input", renderList);
sortEl.addEventListener("change", renderList);
document.getElementById("clearfocus").addEventListener("click", () => setFocus(null));
document.getElementById("flash").addEventListener("click", () => {
  flashUntil = performance.now() + 1500;
});

function renderList() {
  const q = searchEl.value.trim().toLowerCase();
  const mode = sortEl.value;
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
  const ul = document.getElementById("bodylist");
  ul.innerHTML = "";
  for (const b of rows) {
    const li = document.createElement("li");
    if (b.id === focusId) li.classList.add("focused");
    const au = Math.hypot(b.position.x, b.position.y, b.position.z) / 1.495978707e11;
    li.innerHTML = `<span>${b.name}</span><small>${au.toFixed(2)} AU</small>`;
    li.addEventListener("click", () => setFocus(b.id));
    ul.appendChild(li);
  }
}

function setFocus(id) {
  focusId = id;
  if (id === null) {
    xform.targetOrigin.set(0, 0, 0);
    xform.targetBoost = 1;
  }
  renderList();
}
addEventListener("keydown", (e) => { if (e.key === "Escape") setFocus(null); });

// hover tooltip + dblclick focus via raycasting
const raycaster = new THREE.Raycaster();
const pointer = new THREE.Vector2();
const tooltip = document.getElementById("tooltip");
let hovered = null;

function pickBody(ev) {
  pointer.set((ev.clientX / innerWidth) * 2 - 1, -(ev.clientY / innerHeight) * 2 + 1);
  raycaster.setFromCamera(pointer, camera);
  const hits = raycaster.intersectObjects([...views.values()].map((v) => v.sprite));
  return hits.length ? hits[0].object.userData.body : null;
}

addEventListener("pointermove", (ev) => {
  hovered = pickBody(ev);
  if (!hovered) { tooltip.style.display = "none"; return; }
  const b = hovered.info;
  const au = Math.hypot(b.position.x, b.position.y, b.position.z) / 1.495978707e11;
  tooltip.innerHTML =
    `<b>${b.name}</b><br>` +
    `radius ${b.radius_km.toLocaleString()} km<br>` +
    `mass ${b.mass_kg.toExponential(3)} kg<br>` +
    `dist ${au.toFixed(3)} AU` +
    (b.T_seconds ? `<br>period ${(b.T_seconds / 86400).toFixed(1)} d` : "") +
    (b.fg_ms2 ? `<br>surface g ${b.fg_ms2.toFixed(2)} m/s²` : "");
  tooltip.style.display = "block";
  tooltip.style.left = `${ev.clientX + 14}px`;
  tooltip.style.top = `${ev.clientY + 14}px`;
});

addEventListener("dblclick", (ev) => {
  const b = pickBody(ev);
  if (b) setFocus(b.id);
});

// ---------- polling ----------
async function poll() {
  try {
    const res = await fetch("/api/state");
    if (res.ok) ingest(await res.json(), false);
  } catch (err) { /* server restarting; keep lerping */ }
  setTimeout(poll, POLL_MS);
}

// ---------- render loop ----------
function animate() {
  requestAnimationFrame(animate);
  const now = performance.now();

  // focus follow: origin eases to the focused body, boost eases in
  if (focusId !== null) {
    const v = views.get(focusId);
    if (v) {
      xform.targetOrigin.copy(v.meters);
      const d = camera.position.length();
      xform.targetBoost = Math.min(1e6, Math.max(1, Math.pow(WORLD_RADIUS / Math.max(d, 1e-3), 0.8) * 40));
    }
  }
  xform.origin.lerp(xform.targetOrigin, 0.06);
  xform.boost += (xform.targetBoost - xform.boost) * 0.06;

  for (const view of views.values()) view.update(now, sizeScale);
  controls.update();
  renderer.render(scene, camera);
}

addEventListener("resize", () => {
  camera.aspect = innerWidth / innerHeight;
  camera.updateProjectionMatrix();
  renderer.setSize(innerWidth, innerHeight);
});

// ---------- boot ----------
ingest(boot.snapshot, true);
frameScene();
animate();
poll();
