// Executes the data-parallel WorkerPool + compute workers under node:
// `Worker` is shimmed onto node worker_threads (compute_worker.js runs in
// real worker threads via node_compute_adapter.mjs, with MessageChannel
// ports transferred exactly as in the browser), then the pool's sharded
// normalize and kmeans are checked against the single-threaded kernels.
import test from 'node:test';
import assert from 'node:assert/strict';
import { Worker as NodeWorker } from 'node:worker_threads';

const adapter = new URL('./node_compute_adapter.mjs', import.meta.url);

class BrowserishWorker {
  constructor() {
    this.w = new NodeWorker(adapter);
    this.w.unref();
    this._listeners = new Map();
  }
  postMessage(m, transfer = []) {
    this.w.postMessage(m, transfer);
  }
  addEventListener(type, fn) {
    // browser 'error' events carry .message; node passes an Error directly
    const wrapped = (err) => fn(err instanceof Error ? err : { message: String(err) });
    this._listeners.set(fn, wrapped);
    this.w.on(type === 'error' ? 'error' : 'messageerror', wrapped);
  }
  removeEventListener(type, fn) {
    const wrapped = this._listeners.get(fn);
    if (wrapped) this.w.off(type === 'error' ? 'error' : 'messageerror', wrapped);
    this._listeners.delete(fn);
  }
  terminate() {
    return this.w.terminate();
  }
}

globalThis.Worker = BrowserishWorker;
globalThis.navigator = globalThis.navigator || { hardwareConcurrency: 4 };

const { WorkerPool } = await import('../worker_pool.js');

function makeData(n, d) {
  const flat = new Float32Array(n * d);
  for (let i = 0; i < n; i++) {
    const c = i % 3;
    for (let j = 0; j < d; j++) flat[i * d + j] = (j % 3 === c ? 4 : 0) + Math.sin(i * 7.77 + j) * 0.3;
  }
  return flat;
}

function refNormalize(flat, n, d) {
  const out = new Float32Array(n * d);
  for (let i = 0; i < n; i++) {
    let s = 0;
    for (let j = 0; j < d; j++) s += flat[i * d + j] ** 2;
    const inv = s ? 1 / Math.sqrt(s) : 0;
    for (let j = 0; j < d; j++) out[i * d + j] = flat[i * d + j] * inv;
  }
  return out;
}

test('pool.normalize matches single-threaded normalize', async () => {
  const n = 1000, d = 24;
  const flat = makeData(n, d);
  const pool = new WorkerPool(4);
  try {
    const out = await pool.normalize(flat.slice(), n, d);
    const ref = refNormalize(flat, n, d);
    for (let i = 0; i < n * d; i++) {
      assert.ok(Math.abs(out[i] - ref[i]) < 1e-6, `elem ${i}: ${out[i]} vs ${ref[i]}`);
    }
  } finally {
    pool.terminate();
  }
});

test('pool.kmeans separates well-separated clusters', async () => {
  const n = 900, d = 24;
  const flat = makeData(n, d);
  const pool = new WorkerPool(4);
  try {
    const labels = await pool.kmeans(flat.slice(), n, d, 3);
    assert.equal(labels.length, n);
    assert.ok([...labels].every((l) => l >= 0 && l < 3));
    // purity: each kmeans label dominated by one true cluster
    const byLabel = new Map();
    for (let i = 0; i < n; i++) {
      if (!byLabel.has(labels[i])) byLabel.set(labels[i], [0, 0, 0]);
      byLabel.get(labels[i])[i % 3]++;
    }
    let pure = 0;
    for (const counts of byLabel.values()) pure += Math.max(...counts);
    assert.ok(pure / n > 0.95, `purity ${pure / n}`);
  } finally {
    pool.terminate();
  }
});

test('pool calls reject (not hang) when the compute worker is broken', async () => {
  // a worker whose script fails to load never replies on the MessageChannel;
  // the pool must reject via the timeout so worker.js can fall back
  class DeadWorker {
    postMessage() {}
    terminate() {}
  }
  const RealWorker = globalThis.Worker;
  globalThis.Worker = DeadWorker;
  try {
    const pool = new WorkerPool(2, { callTimeoutMs: 200 });
    const flat = new Float32Array(64);
    await assert.rejects(() => pool.normalize(flat, 8, 8), /timed out/);
    pool.terminate();
  } finally {
    globalThis.Worker = RealWorker;
  }
});

test('pool normalize spreads chunks across workers (not all on worker 0)', async () => {
  // chunk size divisible by pool size — the old `start % size` routing sent
  // every chunk to worker 0
  const used = new Set();
  class CountingWorker extends BrowserishWorker {
    postMessage(m, transfer) {
      used.add(this);
      super.postMessage(m, transfer);
    }
  }
  const RealWorker = globalThis.Worker;
  globalThis.Worker = CountingWorker;
  try {
    const n = 32, d = 4; // 4 workers -> per=8, starts 0/8/16/24 all ≡ 0 mod 4
    const pool = new WorkerPool(4);
    await pool.normalize(makeData(n, d), n, d);
    pool.terminate();
    assert.ok(used.size > 1, `expected >1 workers used, got ${used.size}`);
  } finally {
    globalThis.Worker = RealWorker;
  }
});

test('worker.js uses the pool above the size threshold', async () => {
  // drive the orchestrating worker with a >20k-row dataset and assert the
  // pool LOG line appears (the sharded path actually ran)
  const messages = [];
  globalThis.postMessage = (m) => messages.push(m);
  globalThis.self = globalThis;
  await import('../worker.js');

  const n = 21000, d = 8;
  const rows = [];
  for (let i = 0; i < n; i++) {
    rows.push({ embedding: Array.from({ length: d }, (_, j) => Math.sin(i + j)), Title: `t${i}` });
  }
  const buffer = new TextEncoder().encode(JSON.stringify(rows)).buffer;
  await self.onmessage({ data: { type: 'LOAD_FILE', buffer, name: 'big.json', k: 4 } });
  const logs = messages.filter((m) => m.type === 'LOG').map((m) => m.message);
  assert.ok(logs.some((m) => m.includes('worker pool:')), logs.join(' | '));
  const ready = messages.filter((m) => m.type === 'DATA_READY');
  assert.equal(ready.length, 1);
  assert.equal(ready[0].n, n);
});
