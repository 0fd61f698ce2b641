// Per-chunk compute worker: kernels over a shard of the dataset.
// Counterpart of /root/reference/visualizer/compute_worker.js; each worker
// may load its own WASM instance, with JS fallbacks.

let wasm = null;
let wasmTried = false;

async function ensureWasm() {
  if (wasmTried) return wasm;
  wasmTried = true;
  try {
    const mod = await import('./cm3p_analytics.js');
    wasm = await mod.default();
  } catch {
    wasm = null;
  }
  return wasm;
}

function normalizeChunk(chunk, n, d) {
  const out = new Float32Array(n * d);
  for (let i = 0; i < n; i++) {
    let s = 0;
    const off = i * d;
    for (let j = 0; j < d; j++) s += chunk[off + j] * chunk[off + j];
    if (s === 0) continue;
    const inv = 1 / Math.sqrt(s);
    for (let j = 0; j < d; j++) out[off + j] = chunk[off + j] * inv;
  }
  return out;
}

function assignChunk(chunk, labels, n, d, k, centroids) {
  let changed = 0;
  for (let i = 0; i < n; i++) {
    let best = labels[i], bestD = Infinity;
    for (let c = 0; c < k; c++) {
      let s = 0;
      for (let f = 0; f < d; f++) {
        const v = chunk[i * d + f] - centroids[c * d + f];
        s += v * v;
      }
      if (s < bestD) { bestD = s; best = c; }
    }
    if (labels[i] !== best) { changed++; labels[i] = best; }
  }
  return changed;
}

function updateChunk(chunk, labels, n, d, k) {
  const sums = new Float32Array(k * d);
  const counts = new Uint32Array(k);
  for (let i = 0; i < n; i++) {
    const c = labels[i];
    counts[c]++;
    for (let f = 0; f < d; f++) sums[c * d + f] += chunk[i * d + f];
  }
  return { sums, counts };
}

self.onmessage = async (e) => {
  const { type, port } = e.data;
  try {
    await ensureWasm();
    switch (type) {
      case 'NORMALIZE_CHUNK': {
        const { chunk, n, d } = e.data;
        const out = normalizeChunk(chunk, n, d);
        port.postMessage({ out: out.buffer }, [out.buffer]);
        break;
      }
      case 'KMEANS_ASSIGN_CHUNK': {
        const { chunk, labels, n, d, k, centroids } = e.data;
        const lab = new Int8Array(labels);
        const changed = assignChunk(chunk, lab, n, d, k, centroids);
        port.postMessage({ labels: lab.buffer, changed }, [lab.buffer]);
        break;
      }
      case 'KMEANS_UPDATE_CHUNK': {
        const { chunk, labels, n, d, k } = e.data;
        const { sums, counts } = updateChunk(chunk, new Int8Array(labels), n, d, k);
        port.postMessage({ sums: sums.buffer, counts: counts.buffer }, [sums.buffer, counts.buffer]);
        break;
      }
      default:
        port.postMessage({ error: 'unknown message ' + type });
    }
  } catch (err) {
    port.postMessage({ error: err.message });
  }
};
