// Orchestrating Web Worker: data loading, analytics pipeline, queries.
//
// Message API (parity with the reference worker,
// /root/reference/visualizer/worker_wasm.js):
//   LOAD_FILE            {buffer, name}        -> DATA_READY {points, labels, columns, n}
//   FILTER_AND_PROJECT   {query, projection}   -> DATA_READY (filtered subset)
//   RECLUSTER            {k}                   -> CLUSTERS {labels}
//   GET_METADATA         {index}               -> METADATA {row}
//   FIND_NEIGHBORS       {index, k}            -> NEIGHBORS {indices, distances, rows}
//   SEARCH               {text}                -> SEARCH_RESULTS {indices}
//   EXPORT_CSV           {}                    -> CSV {text}
//
// Compute kernels: WASM module (cm3p_analytics.js, built from the C++ core)
// when present, pure-JS fallbacks otherwise. Parquet parsing uses hyparquet
// from CDN when reachable; JSON/CSV always work offline.

import { WorkerPool } from './worker_pool.js';

let wasm = null;
let pool = null;

// datasets past this size shard normalize/kmeans across the compute-worker
// pool (<=8 workers, transferable buffers, main-side reduce)
const POOL_THRESHOLD = 20000;

function initPool(n) {
  if (pool || n < POOL_THRESHOLD || typeof Worker === 'undefined') return;
  try {
    pool = new WorkerPool();
    postMessage({ type: 'LOG', message: `worker pool: ${pool.size} compute workers` });
  } catch (e) {
    pool = null;
    postMessage({ type: 'LOG', message: 'worker pool unavailable: ' + e.message });
  }
}

// run the sharded pool path, falling back to the single-threaded kernel on
// any pool failure (nested-worker load errors surface asynchronously — the
// pool's _call rejects on worker error or timeout; the inputs passed to the
// pool are slice copies, so the originals are intact for the fallback)
async function withPool(poolFn, fallbackFn) {
  if (!pool) return fallbackFn();
  try {
    return await poolFn();
  } catch (e) {
    postMessage({ type: 'LOG', message: `worker pool failed (${e.message}); using single-threaded path` });
    try {
      pool.terminate();
    } catch (_) {
      // already-dead workers
    }
    pool = null;
    return fallbackFn();
  }
}

// dataset state
let columns = {};        // name -> array
let columnNames = [];
let embeddings = null;   // Float32Array flat
let normalized = null;
let nSamples = 0;
let nFeatures = 0;
let labels = null;       // Int8Array
let points = null;       // Float32Array n*2
let activeIndices = null; // Uint32Array view into the full dataset

// ------------------------------------------------------------- JS kernels

function jsNormalize(flat, n, d) {
  const out = new Float32Array(n * d);
  for (let i = 0; i < n; i++) {
    let s = 0;
    const off = i * d;
    for (let j = 0; j < d; j++) s += flat[off + j] * flat[off + j];
    if (s === 0) continue;
    const inv = 1 / Math.sqrt(s);
    for (let j = 0; j < d; j++) out[off + j] = flat[off + j] * inv;
  }
  return out;
}

function lcg(state) {
  return (Math.imul(state, 1664525) + 1013904223) >>> 0;
}

function jsPca(flat, n, d, seed = 12345) {
  const out = new Float32Array(n * 2);
  if (n === 0 || d === 0) return out;
  const mean = new Float64Array(d);
  for (let i = 0; i < n; i++)
    for (let j = 0; j < d; j++) mean[j] += flat[i * d + j];
  for (let j = 0; j < d; j++) mean[j] /= n;

  let state = seed >>> 0;
  const comps = [];
  for (let c = 0; c < 2; c++) {
    let ev = new Float64Array(d);
    for (let j = 0; j < d; j++) {
      state = lcg(state);
      ev[j] = state / 4294967296 - 0.5;
    }
    let mag = Math.sqrt(ev.reduce((a, v) => a + v * v, 0));
    for (let j = 0; j < d; j++) ev[j] /= mag || 1;
    for (let it = 0; it < 8; it++) {
      const next = new Float64Array(d);
      for (let i = 0; i < n; i++) {
        const off = i * d;
        let score = 0;
        for (let j = 0; j < d; j++) score += (flat[off + j] - mean[j]) * ev[j];
        for (let j = 0; j < d; j++) next[j] += score * (flat[off + j] - mean[j]);
      }
      mag = Math.sqrt(next.reduce((a, v) => a + v * v, 0));
      if (mag > 0) for (let j = 0; j < d; j++) ev[j] = next[j] / mag;
    }
    if (c === 1) {
      const u = comps[0];
      let dot = 0;
      for (let j = 0; j < d; j++) dot += u[j] * ev[j];
      for (let j = 0; j < d; j++) ev[j] -= dot * u[j];
      mag = Math.sqrt(ev.reduce((a, v) => a + v * v, 0));
      if (mag > 0) for (let j = 0; j < d; j++) ev[j] /= mag;
    }
    comps.push(ev);
  }
  for (let i = 0; i < n; i++) {
    const off = i * d;
    let x = 0, y = 0;
    for (let j = 0; j < d; j++) {
      const v = flat[off + j] - mean[j];
      x += v * comps[0][j];
      y += v * comps[1][j];
    }
    out[i * 2] = x;
    out[i * 2 + 1] = y;
  }
  return out;
}

function jsKmeans(flat, n, d, k, seed = 42) {
  const lab = new Int8Array(n);
  if (n === 0 || k === 0) return lab;
  let state = seed >>> 0;
  const centroids = new Float32Array(k * d);
  state = lcg(state);
  centroids.set(flat.subarray((state % n) * d, (state % n) * d + d), 0);
  const dist = new Float32Array(n).fill(Infinity);
  for (let i = 1; i < k; i++) {
    const prevOff = (i - 1) * d;
    for (let j = 0; j < n; j++) {
      let s = 0;
      for (let f = 0; f < d; f++) {
        const c = flat[j * d + f] - centroids[prevOff + f];
        s += c * c;
      }
      if (s < dist[j]) dist[j] = s;
    }
    let maxIdx = 0, maxD = 0;
    for (let j = 0; j < n; j++) if (dist[j] > maxD) { maxD = dist[j]; maxIdx = j; }
    centroids.set(flat.subarray(maxIdx * d, maxIdx * d + d), i * d);
  }
  for (let iter = 0; iter < 10; iter++) {
    let changed = 0;
    for (let i = 0; i < n; i++) {
      let best = lab[i], bestD = Infinity;
      for (let c = 0; c < k; c++) {
        let s = 0;
        for (let f = 0; f < d; f++) {
          const v = flat[i * d + f] - centroids[c * d + f];
          s += v * v;
        }
        if (s < bestD) { bestD = s; best = c; }
      }
      if (lab[i] !== best) { changed++; lab[i] = best; }
    }
    if (iter > 0 && changed === 0) break;
    const sums = new Float64Array(k * d);
    const counts = new Uint32Array(k);
    for (let i = 0; i < n; i++) {
      counts[lab[i]]++;
      for (let f = 0; f < d; f++) sums[lab[i] * d + f] += flat[i * d + f];
    }
    for (let c = 0; c < k; c++)
      if (counts[c] > 0)
        for (let f = 0; f < d; f++) centroids[c * d + f] = sums[c * d + f] / counts[c];
  }
  return lab;
}

function jsKnn(norm, n, d, query, kNeighbors) {
  const results = [];
  const qOff = query * d;
  for (let i = 0; i < n; i++) {
    if (i === query) continue;
    let dot = 0;
    for (let j = 0; j < d; j++) dot += norm[qOff + j] * norm[i * d + j];
    results.push([1 - dot, i]);
  }
  results.sort((a, b) => a[0] - b[0]);
  const k = Math.min(kNeighbors, results.length);
  return {
    indices: results.slice(0, k).map((r) => r[1]),
    distances: results.slice(0, k).map((r) => r[0]),
  };
}

function findNeighbors(norm, n, d, query, kNeighbors) {
  if (wasm) {
    const inPtr = wasm._malloc(norm.length * 4);
    wasm.HEAPF32.set(norm, inPtr / 4);
    const idxPtr = wasm._malloc(kNeighbors * 4);
    const distPtr = wasm._malloc(kNeighbors * 4);
    const k = wasm._cm3p_knn(inPtr, n, d, query, kNeighbors, idxPtr, distPtr);
    const indices = Array.from(new Uint32Array(wasm.HEAPU32.buffer, idxPtr, k));
    const distances = Array.from(new Float32Array(wasm.HEAPF32.buffer, distPtr, k));
    wasm._free(inPtr); wasm._free(idxPtr); wasm._free(distPtr);
    return { indices, distances };
  }
  return jsKnn(norm, n, d, query, kNeighbors);
}

// -------------------------------------------------------------- WASM glue

async function initWasm() {
  try {
    const mod = await import('./cm3p_analytics.js');
    wasm = await mod.default();
    postMessage({ type: 'LOG', message: 'WASM analytics core loaded' });
  } catch (e) {
    wasm = null;
    postMessage({ type: 'LOG', message: 'WASM unavailable, using JS kernels: ' + e.message });
  }
}

function wasmCall(fnName, flat, n, d, extraArgs, outCtor, outLen) {
  const inPtr = wasm._malloc(flat.length * 4);
  wasm.HEAPF32.set(flat, inPtr / 4);
  const outBytes = outCtor === Int8Array ? outLen : outLen * 4;
  const outPtr = wasm._malloc(outBytes);
  wasm['_' + fnName](inPtr, n, d, ...extraArgs, outPtr);
  const out = outCtor === Int8Array
    ? new Int8Array(wasm.HEAP8.buffer, outPtr, outLen).slice()
    : new Float32Array(wasm.HEAPF32.buffer, outPtr, outLen).slice();
  wasm._free(inPtr);
  wasm._free(outPtr);
  return out;
}

function calculatePCA(flat, n, d) {
  if (wasm) return wasmCall('cm3p_pca', flat, n, d, [12345], Float32Array, n * 2);
  return jsPca(flat, n, d);
}

function calculateKmeans(flat, n, d, k) {
  if (wasm) return wasmCall('cm3p_kmeans', flat, n, d, [k, 42], Int8Array, n);
  return jsKmeans(flat, n, d, k);
}

function normalizeVectors(flat, n, d) {
  if (wasm) return wasmCall('cm3p_normalize', flat, n, d, [], Float32Array, n * d);
  return jsNormalize(flat, n, d);
}

// ----------------------------------------------------------- data parsing

async function parseFile(buffer, name) {
  if (name.endsWith('.json')) {
    const rows = JSON.parse(new TextDecoder().decode(buffer));
    return rowsToColumns(rows);
  }
  if (name.endsWith('.csv')) {
    return csvToColumns(new TextDecoder().decode(buffer));
  }
  // parquet via hyparquet (CDN); fails cleanly offline
  const { parquetReadObjects } = await import('https://cdn.jsdelivr.net/npm/hyparquet@1/+esm');
  const rows = await parquetReadObjects({ file: buffer });
  return rowsToColumns(rows);
}

function rowsToColumns(rows) {
  const cols = {};
  if (rows.length === 0) return cols;
  for (const key of Object.keys(rows[0])) cols[key] = rows.map((r) => r[key]);
  return cols;
}

function csvToColumns(text) {
  const lines = text.trim().split(/\r?\n/);
  const header = lines[0].split(',');
  const cols = {};
  for (const h of header) cols[h] = [];
  for (let i = 1; i < lines.length; i++) {
    const parts = lines[i].split(',');
    header.forEach((h, j) => {
      const v = parts[j];
      const f = parseFloat(v);
      cols[h].push(Number.isNaN(f) || v === '' ? v : f);
    });
  }
  return cols;
}

function extractEmbeddings(cols) {
  // either an 'embedding' list column or e0..eN scalar columns
  if (cols.embedding) {
    const n = cols.embedding.length;
    const d = cols.embedding[0].length;
    const flat = new Float32Array(n * d);
    for (let i = 0; i < n; i++) flat.set(cols.embedding[i], i * d);
    return [flat, n, d];
  }
  const embCols = Object.keys(cols).filter((c) => /^e\d+$/.test(c)).sort((a, b) => +a.slice(1) - +b.slice(1));
  if (embCols.length > 0) {
    const n = cols[embCols[0]].length;
    const d = embCols.length;
    const flat = new Float32Array(n * d);
    for (let i = 0; i < n; i++)
      for (let j = 0; j < d; j++) flat[i * d + j] = cols[embCols[j]][i];
    return [flat, n, d];
  }
  throw new Error('No embedding column found');
}

// --------------------------------------------------------- query language
// Mini language (parity: worker_wasm.js:341-540): `col op value` tuples
// joined by AND or `;`. Ops: ==, !=, >, >=, <, <=, contains. Columns match
// case-insensitively; numeric comparisons use a small float tolerance.

function buildSubqueries(query) {
  return query
    .split(/;|\bAND\b/i)
    .map((s) => s.trim())
    .filter(Boolean)
    .map((s) => {
      const m = s.match(/^(.+?)\s*(==|!=|>=|<=|>|<|contains)\s*(.+)$/i);
      if (!m) return null;
      return { column: m[1].trim(), op: m[2].toLowerCase(), value: m[3].trim() };
    })
    .filter(Boolean);
}

function resolveColumn(name) {
  const lower = name.toLowerCase();
  return columnNames.find((c) => c.toLowerCase() === lower);
}

function rowMatchesQuery(idx, subqueries) {
  for (const q of subqueries) {
    const col = resolveColumn(q.column);
    if (!col) return false;
    const cell = columns[col][idx];
    const num = parseFloat(q.value);
    const isNum = !Number.isNaN(num) && typeof cell === 'number';
    const tol = 1e-6;
    let ok;
    switch (q.op) {
      case '==': ok = isNum ? Math.abs(cell - num) < tol : String(cell).toLowerCase() === q.value.toLowerCase(); break;
      case '!=': ok = isNum ? Math.abs(cell - num) >= tol : String(cell).toLowerCase() !== q.value.toLowerCase(); break;
      case '>': ok = isNum && cell > num; break;
      case '>=': ok = isNum && cell >= num - tol; break;
      case '<': ok = isNum && cell < num; break;
      case '<=': ok = isNum && cell <= num + tol; break;
      case 'contains': ok = String(cell).toLowerCase().includes(q.value.toLowerCase()); break;
      default: ok = false;
    }
    if (!ok) return false;
  }
  return true;
}

// ------------------------------------------------------------------ UMAP

async function projectUmap(flat, n, d) {
  if (n > 5000) {
    postMessage({ type: 'LOG', message: 'UMAP capped at 5000 points; falling back to PCA' });
    return calculatePCA(flat, n, d);
  }
  try {
    const { UMAP } = await import('https://cdn.jsdelivr.net/npm/umap-js@1/+esm');
    const data = [];
    for (let i = 0; i < n; i++) data.push(Array.from(flat.subarray(i * d, (i + 1) * d)));
    const um = new UMAP({ nComponents: 2 });
    const res = um.fit(data);
    const out = new Float32Array(n * 2);
    for (let i = 0; i < n; i++) { out[i * 2] = res[i][0]; out[i * 2 + 1] = res[i][1]; }
    return out;
  } catch (e) {
    postMessage({ type: 'LOG', message: 'umap-js unavailable; using PCA: ' + e.message });
    return calculatePCA(flat, n, d);
  }
}

// --------------------------------------------------------------- pipeline

function gatherSubset(indices) {
  const sub = new Float32Array(indices.length * nFeatures);
  indices.forEach((src, i) => sub.set(embeddings.subarray(src * nFeatures, (src + 1) * nFeatures), i * nFeatures));
  return sub;
}

function metadataRow(idx) {
  const row = {};
  for (const c of columnNames) {
    if (c === 'embedding') continue;
    row[c] = columns[c][idx];
  }
  return row;
}

function categoricalColumns(maxDistinct = 24) {
  // columns worth a discrete color legend: strings, or numerics with few
  // distinct values (Mode, Year, Ranked, ...) — reference app.js color modes
  const out = [];
  for (const c of columnNames) {
    if (c === 'embedding' || /^e\d+$/.test(c)) continue;
    const vals = columns[c];
    const distinct = new Set();
    let ok = true;
    for (let i = 0; i < vals.length; i++) {
      const v = vals[i];
      if (v != null && typeof v === 'object') { ok = false; break; }
      distinct.add(String(v));
      if (distinct.size > maxDistinct) { ok = false; break; }
    }
    if (ok && distinct.size > 1) out.push(c);
  }
  return out;
}

async function runPipeline(indices, projection, k) {
  activeIndices = indices;
  const sub = indices.length === nSamples ? embeddings : gatherSubset(indices);
  const n = indices.length;
  points = projection === 'umap' ? await projectUmap(sub, n, nFeatures) : calculatePCA(sub, n, nFeatures);
  labels = await withPool(
    () => pool.kmeans(sub, n, nFeatures, k),
    () => calculateKmeans(sub, n, nFeatures, k)
  );
  postMessage(
    {
      type: 'DATA_READY',
      n,
      points,
      labels,
      indices: Array.from(indices),
      columns: columnNames.filter((c) => c !== 'embedding'),
      categorical: categoricalColumns(),
    },
    [points.buffer.slice(0)].length ? [] : []
  );
}

let currentK = 8;

self.onmessage = async (e) => {
  const msg = e.data;
  try {
    switch (msg.type) {
      case 'LOAD_FILE': {
        await initWasm();
        columns = await parseFile(msg.buffer, msg.name);
        columnNames = Object.keys(columns);
        [embeddings, nSamples, nFeatures] = extractEmbeddings(columns);
        initPool(nSamples);
        normalized = await withPool(
          () => pool.normalize(embeddings, nSamples, nFeatures),
          () => normalizeVectors(embeddings, nSamples, nFeatures)
        );
        currentK = msg.k || 8;
        await runPipeline(Uint32Array.from({ length: nSamples }, (_, i) => i), 'pca', currentK);
        break;
      }
      case 'FILTER_AND_PROJECT': {
        const sub = buildSubqueries(msg.query || '');
        const keep = [];
        for (let i = 0; i < nSamples; i++) if (rowMatchesQuery(i, sub)) keep.push(i);
        await runPipeline(Uint32Array.from(keep), msg.projection || 'pca', currentK);
        break;
      }
      case 'RECLUSTER': {
        currentK = msg.k;
        const sub = activeIndices.length === nSamples ? embeddings : gatherSubset(activeIndices);
        labels = await withPool(
          () => pool.kmeans(sub, activeIndices.length, nFeatures, currentK),
          () => calculateKmeans(sub, activeIndices.length, nFeatures, currentK)
        );
        postMessage({ type: 'CLUSTERS', labels });
        break;
      }
      case 'GET_COLUMN': {
        const col = resolveColumn(msg.name);
        const idx = activeIndices || Uint32Array.from({ length: nSamples }, (_, i) => i);
        const values = col ? Array.from(idx, (src) => columns[col][src]) : [];
        postMessage({ type: 'COLUMN', name: msg.name, values });
        break;
      }
      case 'GET_METADATA':
        postMessage({ type: 'METADATA', index: msg.index, row: metadataRow(msg.index) });
        break;
      case 'FIND_NEIGHBORS': {
        const res = findNeighbors(normalized, nSamples, nFeatures, msg.index, msg.k || 10);
        postMessage({
          type: 'NEIGHBORS',
          query: msg.index,
          indices: res.indices,
          distances: res.distances,
          rows: res.indices.map(metadataRow),
        });
        break;
      }
      case 'SEARCH': {
        const text = msg.text.toLowerCase();
        const fields = ['Title', 'Artist', 'Creator', 'Version'].map(resolveColumn).filter(Boolean);
        const hits = [];
        for (let i = 0; i < nSamples && hits.length < 50; i++)
          if (fields.some((f) => String(columns[f][i]).toLowerCase().includes(text))) hits.push(i);
        postMessage({ type: 'SEARCH_RESULTS', indices: hits });
        break;
      }
      case 'EXPORT_CSV': {
        const cols = columnNames.filter((c) => c !== 'embedding');
        const idx = activeIndices || Uint32Array.from({ length: nSamples }, (_, i) => i);
        const lines = [cols.join(',') + ',cluster,x,y'];
        idx.forEach((src, i) => {
          const vals = cols.map((c) => JSON.stringify(columns[c][src] ?? ''));
          lines.push(`${vals.join(',')},${labels[i]},${points[i * 2]},${points[i * 2 + 1]}`);
        });
        postMessage({ type: 'CSV', text: lines.join('\n') });
        break;
      }
      default:
        postMessage({ type: 'ERROR', message: 'Unknown message: ' + msg.type });
    }
  } catch (err) {
    postMessage({ type: 'ERROR', message: err.message });
  }
};

postMessage({ type: 'READY' });
