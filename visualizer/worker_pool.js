// Data-parallel worker pool for chunked analytics.
//
// Shards k-means assign/update and normalization across up to 8 compute
// workers using transferable buffers with a main-worker reduce, the same
// scheme as the reference pool (/root/reference/visualizer/worker_pool.js).

const MAX_WORKERS = 8;

export class WorkerPool {
  constructor(size = null) {
    this.size = Math.min(size || (navigator.hardwareConcurrency || 4), MAX_WORKERS);
    this.workers = [];
    for (let i = 0; i < this.size; i++) {
      this.workers.push(new Worker('./compute_worker.js', { type: 'module' }));
    }
  }

  _call(worker, message, transfer = []) {
    return new Promise((resolve, reject) => {
      const channel = new MessageChannel();
      channel.port1.onmessage = (e) => (e.data.error ? reject(new Error(e.data.error)) : resolve(e.data));
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
      this._chunks(n).map(async ([start, end]) => {
        const chunk = flat.slice(start * d, end * d);
        const res = await this._call(
          this.workers[start % this.size],
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
