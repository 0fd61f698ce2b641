// Data-parallel worker pool for chunked analytics.
//
// Shards k-means assign/update and normalization across up to 8 compute
// workers using transferable buffers with a main-worker reduce, the same
// scheme as the reference pool (/root/reference/visualizer/worker_pool.js).

const MAX_WORKERS = 8;
const CALL_TIMEOUT_MS = 60000;

export class WorkerPool {
  constructor(size = null, { callTimeoutMs = CALL_TIMEOUT_MS } = {}) {
    this.size = Math.min(size || (navigator.hardwareConcurrency || 4), MAX_WORKERS);
    this.callTimeoutMs = callTimeoutMs;
    this.workers = [];
    for (let i = 0; i < this.size; i++) {
      this.workers.push(new Worker('./compute_worker.js', { type: 'module' }));
    }
  }

  _call(worker, message, transfer = []) {
    return new Promise((resolve, reject) => {
      const channel = new MessageChannel();
      // nested-worker script failures are asynchronous (the constructor
      // succeeds even when compute_worker.js 404s or CSP-blocks), so a
      // reply-port listener alone would await forever — also listen for
      // worker 'error' and bound every call with a timeout so callers can
      // fall back to the single-threaded kernels
      let settled = false;
      const settle = (fn, value) => {
        if (settled) return;
        settled = true;
        clearTimeout(timer);
        if (worker.removeEventListener) {
          worker.removeEventListener('error', onError);
          worker.removeEventListener('messageerror', onError);
        }
        channel.port1.onmessage = null;
        fn(value);
      };
      const onError = (e) => settle(reject, new Error((e && e.message) || 'compute worker error'));
      const timer = setTimeout(
        () => settle(reject, new Error(`compute worker call timed out after ${this.callTimeoutMs} ms`)),
        this.callTimeoutMs
      );
      if (worker.addEventListener) {
        worker.addEventListener('error', onError);
        worker.addEventListener('messageerror', onError);
      }
      channel.port1.onmessage = (e) =>
        e.data.error ? settle(reject, new Error(e.data.error)) : settle(resolve, e.data);
      worker.postMessage({ ...message, port: channel.port2 }, [channel.port2, ...transfer]);
    });
  }

  _chunks(n) {
    const per = Math.ceil(n / this.size);
    const out = [];
    for (let i = 0; i < this.size; i++) {
      const start = i * per;
      const end = Math.min(start + per, n);
      if (start < end) out.push([start, end]);
    }
    return out;
  }

  async normalize(flat, n, d) {
    const out = new Float32Array(n * d);
    await Promise.all(
      this._chunks(n).map(async ([start, end], ci) => {
        const chunk = flat.slice(start * d, end * d);
        // round-robin by chunk INDEX — `start % size` collapses onto
        // worker 0 whenever the chunk length is a multiple of the pool size
        const res = await this._call(
          this.workers[ci % this.size],
          { type: 'NORMALIZE_CHUNK', chunk, n: end - start, d },
          [chunk.buffer]
        );
        out.set(new Float32Array(res.out), start * d);
      })
    );
    return out;
  }

  async kmeans(flat, n, d, k, seed = 42, maxIters = 10) {
    // centroid init on the main side (cheap), parallel assign/update steps
    const labels = new Int8Array(n);
    const centroids = new Float32Array(k * d);
    let state = seed >>> 0;
    const lcg = () => (state = (Math.imul(state, 1664525) + 1013904223) >>> 0);
    lcg();
    centroids.set(flat.subarray((state % n) * d, (state % n) * d + d), 0);
    const dist = new Float32Array(n).fill(Infinity);
    for (let i = 1; i < k; i++) {
      const off = (i - 1) * d;
      for (let j = 0; j < n; j++) {
        let s = 0;
        for (let f = 0; f < d; f++) {
          const c = flat[j * d + f] - centroids[off + f];
          s += c * c;
        }
        if (s < dist[j]) dist[j] = s;
      }
      let maxIdx = 0, maxD = 0;
      for (let j = 0; j < n; j++) if (dist[j] > maxD) { maxD = dist[j]; maxIdx = j; }
      centroids.set(flat.subarray(maxIdx * d, maxIdx * d + d), i * d);
    }

    const chunks = this._chunks(n);
    for (let iter = 0; iter < maxIters; iter++) {
      const results = await Promise.all(
        chunks.map(([start, end], ci) => {
          const chunk = flat.slice(start * d, end * d);
          const labelChunk = labels.slice(start, end);
          return this._call(
            this.workers[ci % this.size],
            { type: 'KMEANS_ASSIGN_CHUNK', chunk, labels: labelChunk, n: end - start, d, k, centroids },
            [chunk.buffer, labelChunk.buffer]
          );
        })
      );
      let changed = 0;
      results.forEach((res, ci) => {
        labels.set(new Int8Array(res.labels), chunks[ci][0]);
        changed += res.changed;
      });
      if (iter > 0 && changed === 0) break;

      // parallel partial sums, reduce on this thread
      const partials = await Promise.all(
        chunks.map(([start, end], ci) => {
          const chunk = flat.slice(start * d, end * d);
          const labelChunk = labels.slice(start, end);
          return this._call(
            this.workers[ci % this.size],
            { type: 'KMEANS_UPDATE_CHUNK', chunk, labels: labelChunk, n: end - start, d, k },
            [chunk.buffer, labelChunk.buffer]
          );
        })
      );
      const sums = new Float64Array(k * d);
      const counts = new Uint32Array(k);
      for (const p of partials) {
        const ps = new Float32Array(p.sums);
        const pc = new Uint32Array(p.counts);
        for (let i = 0; i < k * d; i++) sums[i] += ps[i];
        for (let c = 0; c < k; c++) counts[c] += pc[c];
      }
      for (let c = 0; c < k; c++)
        if (counts[c] > 0)
          for (let f = 0; f < d; f++) centroids[c * d + f] = sums[c * d + f] / counts[c];
    }
    return labels;
  }

  terminate() {
    for (const w of this.workers) w.terminate();
  }
}
