// Adapter: run compute_worker.js (a module Web Worker) inside a node
// worker_threads worker by bridging the browser worker globals.
import { parentPort } from 'node:worker_threads';

globalThis.self = globalThis;
globalThis.postMessage = (m, transfer) => parentPort.postMessage(m, transfer);

await import('../compute_worker.js');

parentPort.on('message', (m) => self.onmessage({ data: m }));
