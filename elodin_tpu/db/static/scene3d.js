"use strict";
// WebGL scene viewer for /api/scene — the browser-side replacement for the
// reference's Bevy 3D viewport (libs/elodin-editor/src/object_3d.rs,
// ui/tiles.rs): object_3d GLB/sphere/box/cylinder meshes posed live from
// telemetry, line_3d trajectories, vector arrows, follow-entity camera.
//
// Layout: a pure-math/pure-parse section (namespace S3D — no DOM, no GL;
// exercised by the contract tests) followed by the renderer + poll loop.

// ---------------------------------------------------------------------------
// S3D: pure math + GLB parsing (no DOM access in this section)
// ---------------------------------------------------------------------------
const S3D = {};

// -- column-major mat4 (WebGL convention) --
S3D.m4ident = function () {
  return new Float32Array([1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1]);
};

S3D.m4mul = function (a, b) {          // a*b (apply b first)
  const o = new Float32Array(16);
  for (let c = 0; c < 4; c++) {
    for (let r = 0; r < 4; r++) {
      o[c*4+r] = a[r] * b[c*4] + a[4+r] * b[c*4+1] +
                 a[8+r] * b[c*4+2] + a[12+r] * b[c*4+3];
    }
  }
  return o;
};

S3D.m4perspective = function (fovY, aspect, near, far) {
  const f = 1 / Math.tan(fovY / 2), nf = 1 / (near - far);
  const o = new Float32Array(16);
  o[0] = f / aspect; o[5] = f;
  o[10] = (far + near) * nf; o[11] = -1;
  o[14] = 2 * far * near * nf;
  return o;
};

// quaternion {x,y,z,w} (+ position [3], uniform-ish scale [3]) -> mat4
S3D.m4fromQuatPosScale = function (q, p, s) {
  const x = q.x, y = q.y, z = q.z, w = q.w;
  const sx = s[0], sy = s[1], sz = s[2];
  const o = new Float32Array(16);
  o[0]  = (1 - 2*(y*y + z*z)) * sx;
  o[1]  = 2*(x*y + w*z) * sx;
  o[2]  = 2*(x*z - w*y) * sx;
  o[4]  = 2*(x*y - w*z) * sy;
  o[5]  = (1 - 2*(x*x + z*z)) * sy;
  o[6]  = 2*(y*z + w*x) * sy;
  o[8]  = 2*(x*z + w*y) * sz;
  o[9]  = 2*(y*z - w*x) * sz;
  o[10] = (1 - 2*(x*x + y*y)) * sz;
  o[12] = p[0]; o[13] = p[1]; o[14] = p[2]; o[15] = 1;
  return o;
};

// Z-up orbit camera: yaw around +z, pitch from the xy-plane.
S3D.m4orbitView = function (target, yaw, pitch, dist) {
  const cp = Math.cos(pitch), sp = Math.sin(pitch);
  const eye = [target[0] + dist * cp * Math.cos(yaw),
               target[1] + dist * cp * Math.sin(yaw),
               target[2] + dist * sp];
  // basis: fwd = target-eye, right = fwd x up, up2 = right x fwd  (up=+z)
  let f = [target[0]-eye[0], target[1]-eye[1], target[2]-eye[2]];
  const fl = Math.hypot(f[0], f[1], f[2]) || 1;
  f = [f[0]/fl, f[1]/fl, f[2]/fl];
  let r = [f[1], -f[0], 0];                       // f x (0,0,1)
  const rl = Math.hypot(r[0], r[1], r[2]) || 1;
  r = [r[0]/rl, r[1]/rl, r[2]/rl];
  const u = [r[1]*f[2] - r[2]*f[1], r[2]*f[0] - r[0]*f[2],
             r[0]*f[1] - r[1]*f[0]];
  const o = new Float32Array(16);
  o[0] = r[0]; o[4] = r[1]; o[8]  = r[2];
  o[1] = u[0]; o[5] = u[1]; o[9]  = u[2];
  o[2] = -f[0]; o[6] = -f[1]; o[10] = -f[2];
  o[12] = -(r[0]*eye[0] + r[1]*eye[1] + r[2]*eye[2]);
  o[13] = -(u[0]*eye[0] + u[1]*eye[1] + u[2]*eye[2]);
  o[14] = f[0]*eye[0] + f[1]*eye[1] + f[2]*eye[2];
  o[15] = 1;
  return o;
};

// glTF node TRS -> mat4 (column-major, matches the glTF "matrix" field)
S3D.m4fromTRS = function (node) {
  if (node.matrix) return new Float32Array(node.matrix);
  const t = node.translation || [0, 0, 0];
  const r = node.rotation || [0, 0, 0, 1];
  const s = node.scale || [1, 1, 1];
  return S3D.m4fromQuatPosScale({x: r[0], y: r[1], z: r[2], w: r[3]}, t, s);
};

// -- minimal binary-glTF (GLB) parser --------------------------------------
// Triangle meshes only: POSITION (+NORMAL if present, else flat normals),
// indices of any component type, node hierarchy flattened to world
// matrices, color from pbrMetallicRoughness.baseColorFactor.  Textures,
// skins, animations and sparse accessors are ignored.
const GLB_MAGIC = 0x46546C67, CH_JSON = 0x4E4F534A, CH_BIN = 0x004E4942;
const CT_BYTES = {5120: 1, 5121: 1, 5122: 2, 5123: 2, 5125: 4, 5126: 4};
const TYPE_N = {SCALAR: 1, VEC2: 2, VEC3: 3, VEC4: 4, MAT4: 16};

S3D.parseGLB = function (buf) {
  const dv = new DataView(buf);
  if (dv.getUint32(0, true) !== GLB_MAGIC) throw new Error("not a GLB");
  let off = 12, json = null, bin = null;
  while (off + 8 <= buf.byteLength) {
    const len = dv.getUint32(off, true), ty = dv.getUint32(off + 4, true);
    const body = buf.slice(off + 8, off + 8 + len);
    if (ty === CH_JSON) json = JSON.parse(new TextDecoder().decode(body));
    else if (ty === CH_BIN) bin = body;
    off += 8 + len + (len % 4 ? 4 - len % 4 : 0);
  }
  if (!json) throw new Error("GLB: no JSON chunk");

  function accessor(i) {
    const a = json.accessors[i];
    const n = TYPE_N[a.type], m = a.count * n;
    const bv = json.bufferViews[a.bufferView];
    const base = (bv.byteOffset || 0) + (a.byteOffset || 0);
    const stride = bv.byteStride || 0;
    const eb = CT_BYTES[a.componentType];
    const mk = {
      5126: Float32Array, 5125: Uint32Array, 5123: Uint16Array,
      5121: Uint8Array, 5122: Int16Array, 5120: Int8Array,
    }[a.componentType];
    if (!stride || stride === n * eb) {
      return new mk(bin, base, m);
    }
    // interleaved: gather element-by-element
    const out = new mk(m);
    for (let e = 0; e < a.count; e++) {
      const src = new mk(bin, base + e * stride, n);
      out.set(src, e * n);
    }
    return out;
  }

  function flatNormals(pos, idx) {
    const norm = new Float32Array(pos.length);
    const nTri = (idx ? idx.length : pos.length / 3) / 3;
    for (let t = 0; t < nTri; t++) {
      const i0 = idx ? idx[3*t] : 3*t, i1 = idx ? idx[3*t+1] : 3*t+1,
            i2 = idx ? idx[3*t+2] : 3*t+2;
      const ax = pos[3*i1]-pos[3*i0], ay = pos[3*i1+1]-pos[3*i0+1],
            az = pos[3*i1+2]-pos[3*i0+2];
      const bx = pos[3*i2]-pos[3*i0], by = pos[3*i2+1]-pos[3*i0+1],
            bz = pos[3*i2+2]-pos[3*i0+2];
      const nx = ay*bz - az*by, ny = az*bx - ax*bz, nz = ax*by - ay*bx;
      for (const i of [i0, i1, i2]) {
        norm[3*i] += nx; norm[3*i+1] += ny; norm[3*i+2] += nz;
      }
    }
    return norm;
  }

  const prims = [];
  function walk(nodeIdx, parent) {
    const node = json.nodes[nodeIdx];
    const world = S3D.m4mul(parent, S3D.m4fromTRS(node));
    if (node.mesh !== undefined) {
      for (const p of json.meshes[node.mesh].primitives || []) {
        if ((p.mode !== undefined && p.mode !== 4) ||
            p.attributes.POSITION === undefined) continue;
        const pos = accessor(p.attributes.POSITION);
        let idx = p.indices !== undefined ? accessor(p.indices) : null;
        if (idx && !(idx instanceof Uint16Array) &&
            !(idx instanceof Uint32Array)) idx = Uint32Array.from(idx);
        const norm = p.attributes.NORMAL !== undefined
          ? accessor(p.attributes.NORMAL) : flatNormals(pos, idx);
        let color = [0.72, 0.72, 0.74, 1];
        if (p.material !== undefined) {
          const pbr = (json.materials[p.material] || {}).pbrMetallicRoughness;
          if (pbr && pbr.baseColorFactor) color = pbr.baseColorFactor;
        }
        prims.push({pos, norm, idx, color, matrix: world});
      }
    }
    for (const c of node.children || []) walk(c, world);
  }
  const scene = json.scenes ? json.scenes[json.scene || 0] : null;
  const roots = scene ? scene.nodes : (json.nodes || []).map((_, i) => i);
  for (const r of roots) walk(r, S3D.m4ident());
  return prims;
};

// -- unit primitive geometry (unit radius / unit edge, axis per Foxglove) --
S3D.geomCube = function () {
  // 6 faces x 4 verts, unit cube centered at origin
  const p = [], n = [], idx = [];
  const faces = [
    [[1,0,0], [0,1,0], [0,0,1]], [[-1,0,0], [0,0,1], [0,1,0]],
    [[0,1,0], [0,0,1], [1,0,0]], [[0,-1,0], [1,0,0], [0,0,1]],
    [[0,0,1], [1,0,0], [0,1,0]], [[0,0,-1], [0,1,0], [1,0,0]],
  ];
  for (const [nf, u, v] of faces) {
    const base = p.length / 3;
    for (const [su, sv] of [[-1,-1], [1,-1], [1,1], [-1,1]]) {
      for (let k = 0; k < 3; k++) {
        p.push(0.5 * (nf[k] + su * u[k] + sv * v[k]));
      }
      n.push(nf[0], nf[1], nf[2]);
    }
    idx.push(base, base+1, base+2, base, base+2, base+3);
  }
  return {pos: new Float32Array(p), norm: new Float32Array(n),
          idx: new Uint16Array(idx)};
};

S3D.geomSphere = function (lat, lon) {
  const p = [], n = [], idx = [];
  for (let i = 0; i <= lat; i++) {
    const th = Math.PI * i / lat, st = Math.sin(th), ct = Math.cos(th);
    for (let j = 0; j <= lon; j++) {
      const ph = 2 * Math.PI * j / lon;
      const x = st * Math.cos(ph), y = st * Math.sin(ph), z = ct;
      p.push(x, y, z); n.push(x, y, z);
    }
  }
  for (let i = 0; i < lat; i++) {
    for (let j = 0; j < lon; j++) {
      const a = i * (lon + 1) + j, b = a + lon + 1;
      idx.push(a, b, a+1, b, b+1, a+1);
    }
  }
  return {pos: new Float32Array(p), norm: new Float32Array(n),
          idx: new Uint16Array(idx)};
};

// unit cylinder: radius 1, z in [-0.5, 0.5] (Foxglove cylinder axis = z)
S3D.geomCylinder = function (seg) {
  const p = [], n = [], idx = [];
  for (let j = 0; j <= seg; j++) {
    const ph = 2 * Math.PI * j / seg, c = Math.cos(ph), s = Math.sin(ph);
    p.push(c, s, -0.5); n.push(c, s, 0);
    p.push(c, s, 0.5);  n.push(c, s, 0);
  }
  for (let j = 0; j < seg; j++) {
    const a = 2 * j;
    idx.push(a, a+2, a+1, a+1, a+2, a+3);
  }
  // caps
  for (const [z, nz] of [[-0.5, -1], [0.5, 1]]) {
    const center = p.length / 3;
    p.push(0, 0, z); n.push(0, 0, nz);
    for (let j = 0; j <= seg; j++) {
      const ph = 2 * Math.PI * j / seg;
      p.push(Math.cos(ph), Math.sin(ph), z); n.push(0, 0, nz);
    }
    for (let j = 0; j < seg; j++) {
      if (nz > 0) idx.push(center, center+1+j, center+2+j);
      else idx.push(center, center+2+j, center+1+j);
    }
  }
  return {pos: new Float32Array(p), norm: new Float32Array(n),
          idx: new Uint16Array(idx)};
};

// unit cone: base radius 1 at x=0, apex at x=1 (arrows point along +x)
S3D.geomCone = function (seg) {
  const p = [], n = [], idx = [];
  const inv = 1 / Math.sqrt(2);
  for (let j = 0; j <= seg; j++) {
    const ph = 2 * Math.PI * j / seg, c = Math.cos(ph), s = Math.sin(ph);
    p.push(0, c, s); n.push(inv, c * inv, s * inv);
    p.push(1, 0, 0); n.push(inv, c * inv, s * inv);
  }
  for (let j = 0; j < seg; j++) idx.push(2*j, 2*j+2, 2*j+1);
  const center = p.length / 3;
  p.push(0, 0, 0); n.push(-1, 0, 0);
  for (let j = 0; j <= seg; j++) {
    const ph = 2 * Math.PI * j / seg;
    p.push(0, Math.cos(ph), Math.sin(ph)); n.push(-1, 0, 0);
  }
  for (let j = 0; j < seg; j++) idx.push(center, center+2+j, center+1+j);
  return {pos: new Float32Array(p), norm: new Float32Array(n),
          idx: new Uint16Array(idx)};
};

// arrow primitive -> the two TRS mat4s (shaft cylinder + head cone), in the
// arrow's local frame (+x); pure so the contract tests can pin the layout.
S3D.arrowMats = function (a) {
  const sl = a.shaft_length, sd = a.shaft_diameter / 2;
  const hl = a.head_length, hd = a.head_diameter / 2;
  // cylinder: z-axis unit -> rotate z->x (quat about y by 90deg), scale
  const qzx = {x: 0, y: Math.SQRT1_2, z: 0, w: Math.SQRT1_2};
  const shaft = S3D.m4fromQuatPosScale(qzx, [sl / 2, 0, 0], [sd, sd, sl]);
  const head = S3D.m4fromQuatPosScale(
    {x: 0, y: 0, z: 0, w: 1}, [sl, 0, 0], [hl, hd, hd]);
  return [shaft, head];
};

// entity JSON -> flat draw-list descriptors (geometry kind + model matrix
// + color); models (GLBs) are returned as references for the async loader.
// Frame-locked entities are premultiplied by their frame's live transform
// (scene.transforms, baked by /api/scene from the *.world_pos series).
S3D.buildDrawList = function (scene) {
  const out = {solids: [], lines: [], glbs: []};
  const rawPose2mat = (pose, size) => S3D.m4fromQuatPosScale(
    pose.orientation, [pose.position.x, pose.position.y, pose.position.z],
    size);
  for (const ent of scene.entities || []) {
    const tf = (scene.transforms || {})[ent.frame_id];
    const parent = tf ? rawPose2mat(tf, [1, 1, 1]) : null;
    const pose2mat = (pose, size) => {
      const m = rawPose2mat(pose, size);
      return parent ? S3D.m4mul(parent, m) : m;
    };
    for (const sp of ent.spheres || []) {
      out.solids.push({kind: "sphere", color: sp.color,
        mat: pose2mat(sp.pose, [sp.size.x/2, sp.size.y/2, sp.size.z/2])});
    }
    for (const cb of ent.cubes || []) {
      out.solids.push({kind: "cube", color: cb.color,
        mat: pose2mat(cb.pose, [cb.size.x, cb.size.y, cb.size.z])});
    }
    for (const cy of ent.cylinders || []) {
      out.solids.push({kind: "cylinder", color: cy.color,
        mat: pose2mat(cy.pose, [cy.size.x/2, cy.size.y/2, cy.size.z])});
    }
    for (const ar of ent.arrows || []) {
      const base = pose2mat(ar.pose, [1, 1, 1]);
      const [shaft, head] = S3D.arrowMats(ar);
      out.solids.push({kind: "cylinder", color: ar.color,
                       mat: S3D.m4mul(base, shaft)});
      out.solids.push({kind: "cone", color: ar.color,
                       mat: S3D.m4mul(base, head)});
    }
    for (const ln of ent.lines || []) {
      const pts = new Float32Array((ln.points || []).length * 3);
      (ln.points || []).forEach((pt, i) => {
        pts[3*i] = pt.x; pts[3*i+1] = pt.y; pts[3*i+2] = pt.z;
      });
      out.lines.push({pts, color: ln.color,
                      mat: pose2mat(ln.pose || {position: {x:0,y:0,z:0},
                        orientation: {x:0,y:0,z:0,w:1}}, [1,1,1])});
    }
    for (const md of ent.models || []) {
      out.glbs.push({
        url: md.url || "", data: md.data || "",
        color: md.override_color ? md.color : null,
        mat: pose2mat(md.pose, [md.scale.x, md.scale.y, md.scale.z]),
      });
    }
  }
  return out;
};

// scene bounding radius + center for initial camera framing
S3D.frameScene = function (dl) {
  let n = 0; const c = [0, 0, 0];
  const acc = (m) => { c[0] += m[12]; c[1] += m[13]; c[2] += m[14]; n++; };
  for (const s of dl.solids) acc(s.mat);
  for (const g of dl.glbs) acc(g.mat);
  for (const l of dl.lines) {
    for (let i = 0; i + 2 < l.pts.length; i += 3) {
      c[0] += l.pts[i]; c[1] += l.pts[i+1]; c[2] += l.pts[i+2]; n++;
    }
  }
  if (!n) return {center: [0, 0, 0], radius: 10};
  c[0] /= n; c[1] /= n; c[2] /= n;
  let r2 = 1;
  const far = (x, y, z) => {
    const d = (x-c[0])**2 + (y-c[1])**2 + (z-c[2])**2;
    if (d > r2) r2 = d;
  };
  for (const s of dl.solids) far(s.mat[12], s.mat[13], s.mat[14]);
  for (const g of dl.glbs) far(g.mat[12], g.mat[13], g.mat[14]);
  for (const l of dl.lines) {
    for (let i = 0; i + 2 < l.pts.length; i += 3) {
      far(l.pts[i], l.pts[i+1], l.pts[i+2]);
    }
  }
  return {center: c, radius: Math.sqrt(r2)};
};

// ---------------------------------------------------------------------------
// Renderer + poll loop (DOM/WebGL from here on)
// ---------------------------------------------------------------------------
const VS = `
attribute vec3 aPos; attribute vec3 aNorm;
uniform mat4 uProj, uView, uModel;
varying vec3 vNorm; varying vec3 vView;
void main() {
  vec4 world = uModel * vec4(aPos, 1.0);
  gl_Position = uProj * uView * world;
  vNorm = mat3(uModel) * aNorm;
  vView = -(uView * world).xyz;
}`;
const FS = `
precision mediump float;
uniform vec4 uColor; uniform float uUnlit;
varying vec3 vNorm; varying vec3 vView;
void main() {
  if (uUnlit > 0.5) { gl_FragColor = uColor; return; }
  vec3 n = normalize(vNorm);
  float diff = abs(dot(n, normalize(vView)));
  float l = 0.35 + 0.65 * diff;
  gl_FragColor = vec4(uColor.rgb * l, uColor.a);
}`;

let sceneView = null;   // {card, canvas, gl, bufs, cam, drawList, ...}
const glbCache = {};    // url/data-key -> {prims:[...]} | {error} | {loading}

function compileProgram(gl) {
  const mk = (ty, src) => {
    const sh = gl.createShader(ty);
    gl.shaderSource(sh, src); gl.compileShader(sh);
    if (!gl.getShaderParameter(sh, gl.COMPILE_STATUS)) {
      throw new Error(gl.getShaderInfoLog(sh));
    }
    return sh;
  };
  const prog = gl.createProgram();
  gl.attachShader(prog, mk(gl.VERTEX_SHADER, VS));
  gl.attachShader(prog, mk(gl.FRAGMENT_SHADER, FS));
  gl.linkProgram(prog);
  if (!gl.getProgramParameter(prog, gl.LINK_STATUS)) {
    throw new Error(gl.getProgramInfoLog(prog));
  }
  return prog;
}

function uploadGeom(gl, g) {
  const pos = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, pos);
  gl.bufferData(gl.ARRAY_BUFFER, g.pos, gl.STATIC_DRAW);
  const norm = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, norm);
  gl.bufferData(gl.ARRAY_BUFFER, g.norm, gl.STATIC_DRAW);
  let idx = null, idxType = 0, count = g.pos.length / 3;
  if (g.idx) {
    idx = gl.createBuffer();
    gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER, idx);
    gl.bufferData(gl.ELEMENT_ARRAY_BUFFER, g.idx, gl.STATIC_DRAW);
    idxType = g.idx instanceof Uint32Array ? 5125 : 5123;
    count = g.idx.length;
  }
  return {pos, norm, idx, idxType, count};
}

function gridGeom(extent, step) {
  const pts = [];
  for (let i = -extent; i <= extent; i += step) {
    pts.push(i, -extent, 0, i, extent, 0, -extent, i, 0, extent, i, 0);
  }
  return new Float32Array(pts);
}

function toggleScene3d() {
  if (sceneView) {
    sceneView.closed = true;
    sceneView.card.remove();
    sceneView = null;
    return;
  }
  const card = document.createElement("div");
  card.className = "card";
  card.style.gridColumn = "1 / -1";
  const h2 = document.createElement("h2");
  h2.textContent = "3D scene";
  const hint = document.createElement("span");
  hint.style.cssText = "font-size:11px;color:var(--ink-3);margin-left:8px";
  hint.textContent = "drag orbit · wheel zoom · shift-drag pan";
  h2.append(hint);
  const xbtn = document.createElement("button");
  xbtn.textContent = "close";
  xbtn.style.cssText = "float:right;font-size:11px";
  xbtn.onclick = toggleScene3d;
  h2.prepend(xbtn);
  const canvas = document.createElement("canvas");
  canvas.style.cssText =
    "width:100%;height:480px;touch-action:none;cursor:grab";
  const status = document.createElement("div");
  status.style.cssText = "font-size:11px;color:var(--ink-3)";
  card.append(h2, canvas, status);
  const cards = document.getElementById("cards");
  cards.prepend(card);

  const gl = canvas.getContext("webgl", {antialias: true});
  if (!gl) {
    status.textContent = "WebGL unavailable in this browser";
    return;
  }
  const prog = compileProgram(gl);
  gl.useProgram(prog);
  const loc = {
    aPos: gl.getAttribLocation(prog, "aPos"),
    aNorm: gl.getAttribLocation(prog, "aNorm"),
    uProj: gl.getUniformLocation(prog, "uProj"),
    uView: gl.getUniformLocation(prog, "uView"),
    uModel: gl.getUniformLocation(prog, "uModel"),
    uColor: gl.getUniformLocation(prog, "uColor"),
    uUnlit: gl.getUniformLocation(prog, "uUnlit"),
  };
  const geoms = {
    cube: uploadGeom(gl, S3D.geomCube()),
    sphere: uploadGeom(gl, S3D.geomSphere(18, 28)),
    cylinder: uploadGeom(gl, S3D.geomCylinder(24)),
    cone: uploadGeom(gl, S3D.geomCone(24)),
  };
  const gridPts = gridGeom(100, 10);
  const gridBuf = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, gridBuf);
  gl.bufferData(gl.ARRAY_BUFFER, gridPts, gl.STATIC_DRAW);

  sceneView = {
    card, canvas, gl, prog, loc, geoms, gridBuf,
    gridCount: gridPts.length / 3, status,
    cam: {yaw: 0.8, pitch: 0.5, dist: 40, target: [0, 0, 0]},
    drawList: {solids: [], lines: [], glbs: []},
    lineBufs: [], framed: false, closed: false,
  };

  let drag = null;
  canvas.addEventListener("pointerdown", (e) => {
    drag = {x: e.clientX, y: e.clientY, pan: e.shiftKey};
    canvas.setPointerCapture(e.pointerId);
  });
  canvas.addEventListener("pointermove", (e) => {
    if (!drag || !sceneView) return;
    const dx = e.clientX - drag.x, dy = e.clientY - drag.y;
    const cam = sceneView.cam;
    if (drag.pan) {
      sceneView.userPanned = true;
      const s = cam.dist * 0.0022;
      cam.target[0] -= s * (Math.cos(cam.yaw + Math.PI/2) * dx);
      cam.target[1] -= s * (Math.sin(cam.yaw + Math.PI/2) * dx);
      cam.target[2] += s * dy;
    } else {
      cam.yaw -= dx * 0.008;
      cam.pitch = Math.max(-1.53, Math.min(1.53, cam.pitch + dy * 0.008));
    }
    drag = {x: e.clientX, y: e.clientY, pan: drag.pan};
    drawScene3d();
  });
  canvas.addEventListener("pointerup", () => { drag = null; });
  canvas.addEventListener("wheel", (e) => {
    e.preventDefault();
    if (!sceneView) return;
    sceneView.cam.dist *= Math.exp(e.deltaY * 0.001);
    drawScene3d();
  }, {passive: false});

  pollScene3d();
}

async function pollScene3d() {
  const me = sceneView;
  if (!me || me.closed) return;
  try {
    // honour the shared timeline: when the viewer is scrubbed off live,
    // render the scene at the scrub position (viewer.js owns live/scrubUs)
    let q = "";
    if (typeof live !== "undefined" && !live &&
        typeof scrubUs !== "undefined" && scrubUs != null) {
      q = "?ts_us=" + Math.round(scrubUs);
    }
    const r = await fetch("/api/scene" + q);
    const scene = await r.json();
    if (sceneView !== me || me.closed) return;  // closed/reopened mid-fetch
    me.drawList = S3D.buildDrawList(scene);
    loadGlbs(me);
    if (!me.framed) {
      const fr = S3D.frameScene(me.drawList);
      me.cam.target = fr.center;
      me.cam.dist = Math.max(fr.radius * 2.5, 5);
      me.framed = me.drawList.solids.length + me.drawList.glbs.length +
        me.drawList.lines.length > 0;
    }
    // follow camera (editor parity): track the follow entity's frame
    // unless the user has panned away
    const ftf = scene.follow_entity &&
      (scene.transforms || {})[scene.follow_entity];
    if (ftf && !me.userPanned) {
      me.cam.target = [ftf.position.x, ftf.position.y, ftf.position.z];
    }
    me.status.textContent =
      `${me.drawList.solids.length} solids · ${me.drawList.glbs.length} ` +
      `models · ${me.drawList.lines.length} lines` +
      (scene.warnings && scene.warnings.length
        ? ` · ${scene.warnings[0]}` : "");
    uploadLines(me);
    drawScene3d();
  } catch (e) {
    if (me.status) me.status.textContent = `scene fetch failed: ${e}`;
  }
  if (sceneView === me && !me.closed) setTimeout(pollScene3d, 400);
}

function glbKey(md) {
  return md.url || ("data:" + md.data.length + ":" + md.data.slice(0, 64));
}

function loadGlbs(me) {
  for (const md of me.drawList.glbs) {
    const key = glbKey(md);
    if (glbCache[key]) continue;
    glbCache[key] = {loading: true};
    const done = (buf) => {
      try {
        const prims = S3D.parseGLB(buf).map((p) => ({
          geom: uploadGeom(me.gl, p), color: p.color, matrix: p.matrix,
        }));
        glbCache[key] = {prims};
      } catch (e) {
        glbCache[key] = {error: String(e)};
      }
      drawScene3d();
    };
    if (md.url) {
      fetch(md.url).then((r) => {
        if (!r.ok) throw new Error(`HTTP ${r.status}`);
        return r.arrayBuffer();
      }).then(done).catch((e) => { glbCache[key] = {error: String(e)}; });
    } else if (md.data) {
      const raw = atob(md.data);
      const buf = new Uint8Array(raw.length);
      for (let i = 0; i < raw.length; i++) buf[i] = raw.charCodeAt(i);
      done(buf.buffer);
    }
  }
}

function uploadLines(me) {
  const gl = me.gl;
  for (const b of me.lineBufs) gl.deleteBuffer(b.buf);
  me.lineBufs = me.drawList.lines.map((l) => {
    const buf = gl.createBuffer();
    gl.bindBuffer(gl.ARRAY_BUFFER, buf);
    gl.bufferData(gl.ARRAY_BUFFER, l.pts, gl.STATIC_DRAW);
    return {buf, count: l.pts.length / 3, color: l.color, mat: l.mat};
  });
}

function drawScene3d() {
  const me = sceneView;
  if (!me || me.closed) return;
  const {gl, canvas, loc, geoms} = me;
  const dpr = window.devicePixelRatio || 1;
  const w = canvas.clientWidth, h = canvas.clientHeight || 480;
  if (canvas.width !== w * dpr || canvas.height !== h * dpr) {
    canvas.width = w * dpr; canvas.height = h * dpr;
  }
  gl.viewport(0, 0, canvas.width, canvas.height);
  const dark = matchMedia("(prefers-color-scheme: dark)").matches;
  if (dark) gl.clearColor(0.051, 0.051, 0.051, 1);
  else gl.clearColor(0.976, 0.976, 0.968, 1);
  gl.enable(gl.DEPTH_TEST);
  gl.clear(gl.COLOR_BUFFER_BIT | gl.DEPTH_BUFFER_BIT);

  const cam = me.cam;
  const far = Math.max(cam.dist * 40, 4000);
  const proj = S3D.m4perspective(0.9, (w || 1) / (h || 1), 0.05, far);
  const view = S3D.m4orbitView(cam.target, cam.yaw, cam.pitch, cam.dist);
  gl.useProgram(me.prog);
  gl.uniformMatrix4fv(loc.uProj, false, proj);
  gl.uniformMatrix4fv(loc.uView, false, view);

  const bindGeom = (g) => {
    gl.bindBuffer(gl.ARRAY_BUFFER, g.pos);
    gl.enableVertexAttribArray(loc.aPos);
    gl.vertexAttribPointer(loc.aPos, 3, gl.FLOAT, false, 0, 0);
    gl.bindBuffer(gl.ARRAY_BUFFER, g.norm);
    gl.enableVertexAttribArray(loc.aNorm);
    gl.vertexAttribPointer(loc.aNorm, 3, gl.FLOAT, false, 0, 0);
    if (g.idx) gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER, g.idx);
  };
  const drawGeom = (g, mat, color, unlit) => {
    gl.uniformMatrix4fv(loc.uModel, false, mat);
    gl.uniform4f(loc.uColor, color.r !== undefined ? color.r : color[0],
      color.g !== undefined ? color.g : color[1],
      color.b !== undefined ? color.b : color[2],
      color.a !== undefined ? color.a : color[3]);
    gl.uniform1f(loc.uUnlit, unlit ? 1 : 0);
    if (g.idx) {
      gl.drawElements(gl.TRIANGLES, g.count,
        g.idxType === 5125 ? gl.UNSIGNED_INT : gl.UNSIGNED_SHORT, 0);
    } else {
      gl.drawArrays(gl.TRIANGLES, 0, g.count);
    }
  };
  if (!me._oesChecked) {
    me._oesChecked = true;
    gl.getExtension("OES_element_index_uint");
  }

  // grid floor (unlit hairlines)
  gl.bindBuffer(gl.ARRAY_BUFFER, me.gridBuf);
  gl.enableVertexAttribArray(loc.aPos);
  gl.vertexAttribPointer(loc.aPos, 3, gl.FLOAT, false, 0, 0);
  gl.disableVertexAttribArray(loc.aNorm);
  gl.vertexAttrib3f(loc.aNorm, 0, 0, 1);
  gl.uniformMatrix4fv(loc.uModel, false, S3D.m4ident());
  gl.uniform4f(loc.uColor, dark ? 0.17 : 0.88, dark ? 0.17 : 0.88,
    dark ? 0.16 : 0.85, 1);
  gl.uniform1f(loc.uUnlit, 1);
  gl.drawArrays(gl.LINES, 0, me.gridCount);

  for (const s of me.drawList.solids) {
    bindGeom(geoms[s.kind]);
    drawGeom(geoms[s.kind], s.mat, s.color, false);
  }
  for (const g of me.drawList.glbs) {
    const entry = glbCache[glbKey(g)];
    if (!entry || !entry.prims) {
      // placeholder while the GLB loads (or failed): a small cube
      bindGeom(geoms.cube);
      drawGeom(geoms.cube, g.mat, {r: 0.6, g: 0.6, b: 0.65, a: 1}, false);
      continue;
    }
    for (const p of entry.prims) {
      bindGeom(p.geom);
      drawGeom(p.geom, S3D.m4mul(g.mat, p.matrix),
        g.color || p.color, false);
    }
  }
  for (const l of me.lineBufs) {
    gl.bindBuffer(gl.ARRAY_BUFFER, l.buf);
    gl.enableVertexAttribArray(loc.aPos);
    gl.vertexAttribPointer(loc.aPos, 3, gl.FLOAT, false, 0, 0);
    gl.disableVertexAttribArray(loc.aNorm);
    gl.vertexAttrib3f(loc.aNorm, 0, 0, 1);
    gl.uniformMatrix4fv(loc.uModel, false, l.mat);
    gl.uniform4f(loc.uColor, l.color.r, l.color.g, l.color.b, l.color.a);
    gl.uniform1f(loc.uUnlit, 1);
    gl.drawArrays(gl.LINE_STRIP, 0, l.count);
  }
}

const sceneBtn = document.getElementById("scenebtn");
if (sceneBtn) sceneBtn.onclick = toggleScene3d;
