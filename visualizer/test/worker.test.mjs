// Node-run conformance tests for the orchestrating worker (worker.js).
//
// The worker is a module Web Worker; under node we shim the worker globals
// (`self`, `postMessage`) and drive its message handler directly — the same
// protocol app.js speaks (LOAD_FILE / FILTER_AND_PROJECT / RECLUSTER /
// FIND_NEIGHBORS / SEARCH / EXPORT_CSV). This executes the full pipeline
// with the pure-JS kernel fallbacks (the WASM module and CDN imports are
// absent under node, which also exercises the offline fallbacks).
//
// Run: node --test visualizer/test/   (CI: .github/workflows/tests.yml)
import test from 'node:test';
import assert from 'node:assert/strict';

const messages = [];
globalThis.postMessage = (m) => messages.push(m);
globalThis.self = globalThis;

await import('../worker.js');

function drain(type) {
  const hits = messages.filter((m) => m.type === type);
  messages.length = 0;
  return hits;
}

async function send(msg) {
  await self.onmessage({ data: msg });
}

function makeDataset(n = 120, d = 16) {
  // 3 well-separated clusters + metadata columns
  const rows = [];
  for (let i = 0; i < n; i++) {
    const c = i % 3;
    const emb = Array.from({ length: d }, (_, j) => (j % 3 === c ? 5 : 0) + Math.sin(i * 13.37 + j) * 0.2);
    rows.push({
      embedding: emb,
      Title: `Song ${i}`,
      Artist: c === 0 ? 'Alpha' : c === 1 ? 'Beta' : 'Gamma',
      Creator: `mapper${i % 7}`,
      Version: `Insane ${i}`,
      Year: 2010 + (i % 12),
      Stars: Math.round((2 + (i % 50) / 10) * 10) / 10,
      cluster_true: c,
    });
  }
  return new TextEncoder().encode(JSON.stringify(rows)).buffer;
}

test('LOAD_FILE json -> full pipeline -> DATA_READY', async () => {
  messages.length = 0;
  await send({ type: 'LOAD_FILE', buffer: makeDataset(), name: 'embeddings.json', k: 3 });
  const ready = drain('DATA_READY');
  assert.equal(ready.length, 1);
  const r = ready[0];
  assert.equal(r.n, 120);
  assert.equal(r.points.length, 240);
  assert.equal(r.labels.length, 120);
  assert.ok(!r.columns.includes('embedding'));
  assert.ok(r.columns.includes('Title'));
  assert.ok(r.points.every(Number.isFinite));
});

test('kmeans labels recover the true clusters (majority purity)', async () => {
  messages.length = 0;
  await send({ type: 'LOAD_FILE', buffer: makeDataset(), name: 'e.json', k: 3 });
  const r = drain('DATA_READY')[0];
  // purity: for each kmeans label, the dominant true cluster share
  const byLabel = new Map();
  for (let i = 0; i < r.n; i++) {
    const l = r.labels[i];
    if (!byLabel.has(l)) byLabel.set(l, []);
    byLabel.get(l).push(i % 3);
  }
  let pure = 0;
  for (const members of byLabel.values()) {
    const counts = [0, 0, 0];
    members.forEach((c) => counts[c]++);
    pure += Math.max(...counts);
  }
  assert.ok(pure / r.n > 0.95, `purity ${pure / r.n}`);
});

test('query language: numeric ops, AND chains, case-insensitive columns', async () => {
  messages.length = 0;
  await send({ type: 'LOAD_FILE', buffer: makeDataset(), name: 'e.json', k: 3 });
  drain('DATA_READY');

  await send({ type: 'FILTER_AND_PROJECT', query: 'year >= 2018', projection: 'pca' });
  let r = drain('DATA_READY')[0];
  assert.equal(r.n, 120 / 12 * 4); // years 2018..2021 of 2010..2021

  await send({ type: 'FILTER_AND_PROJECT', query: 'Artist == alpha; stars < 4', projection: 'pca' });
  r = drain('DATA_READY')[0];
  assert.ok(r.n > 0 && r.n < 40);
  // every surviving row is Artist Alpha (indices are into the full dataset)
  assert.ok(r.indices.every((i) => i % 3 === 0));

  await send({ type: 'FILTER_AND_PROJECT', query: 'title contains song 1 AND Year != 2011' });
  r = drain('DATA_READY')[0];
  assert.ok(r.n > 0);

  // float tolerance on ==
  await send({ type: 'FILTER_AND_PROJECT', query: 'Stars == 3.1' });
  r = drain('DATA_READY')[0];
  assert.ok(r.n > 0);
});

test('RECLUSTER emits labels in range', async () => {
  messages.length = 0;
  await send({ type: 'LOAD_FILE', buffer: makeDataset(), name: 'e.json', k: 3 });
  drain('DATA_READY');
  await send({ type: 'RECLUSTER', k: 2 });
  const c = drain('CLUSTERS')[0];
  assert.equal(c.labels.length, 120);
  assert.ok([...c.labels].every((l) => l >= 0 && l < 2));
});

test('FIND_NEIGHBORS returns same-cluster rows, ascending distance', async () => {
  messages.length = 0;
  await send({ type: 'LOAD_FILE', buffer: makeDataset(), name: 'e.json', k: 3 });
  drain('DATA_READY');
  await send({ type: 'FIND_NEIGHBORS', index: 0, k: 8 });
  const nb = drain('NEIGHBORS')[0];
  assert.equal(nb.query, 0);
  assert.equal(nb.indices.length, 8);
  for (let i = 1; i < nb.distances.length; i++) assert.ok(nb.distances[i] >= nb.distances[i - 1]);
  // row 0 is cluster 0; cosine neighbors must share it
  assert.ok(nb.indices.every((i) => i % 3 === 0));
  assert.equal(nb.rows.length, 8);
});

test('SEARCH matches Title/Artist fields', async () => {
  messages.length = 0;
  await send({ type: 'LOAD_FILE', buffer: makeDataset(), name: 'e.json', k: 3 });
  drain('DATA_READY');
  await send({ type: 'SEARCH', text: 'beta' });
  const res = drain('SEARCH_RESULTS')[0];
  assert.ok(res.indices.length > 0);
  assert.ok(res.indices.every((i) => i % 3 === 1));
});

test('EXPORT_CSV emits header + one line per active row', async () => {
  messages.length = 0;
  await send({ type: 'LOAD_FILE', buffer: makeDataset(), name: 'e.json', k: 3 });
  drain('DATA_READY');
  await send({ type: 'EXPORT_CSV' });
  const csv = drain('CSV')[0];
  const lines = csv.text.split('\n');
  assert.equal(lines.length, 121);
  assert.ok(lines[0].includes('cluster,x,y'));
});

test('UMAP falls back to PCA when umap-js is unavailable', async () => {
  messages.length = 0;
  await send({ type: 'LOAD_FILE', buffer: makeDataset(), name: 'e.json', k: 3 });
  drain('DATA_READY');
  await send({ type: 'FILTER_AND_PROJECT', query: '', projection: 'umap' });
  const r = drain('DATA_READY');
  assert.equal(r.length, 1); // pipeline completed despite the missing CDN dep
  assert.ok(r[0].points.every(Number.isFinite));
});

test('CSV input parses', async () => {
  messages.length = 0;
  const d = 4;
  const header = ['Title', ...Array.from({ length: d }, (_, j) => `e${j}`)].join(',');
  const lines = [header];
  for (let i = 0; i < 20; i++) lines.push([`t${i}`, i, i * 2, 1, 0].join(','));
  const buf = new TextEncoder().encode(lines.join('\n')).buffer;
  await send({ type: 'LOAD_FILE', buffer: buf, name: 'rows.csv', k: 2 });
  const r = drain('DATA_READY')[0];
  assert.equal(r.n, 20);
  assert.equal(r.points.length, 40);
});

test('GET_METADATA returns the row dict', async () => {
  messages.length = 0;
  await send({ type: 'LOAD_FILE', buffer: makeDataset(), name: 'e.json', k: 3 });
  drain('DATA_READY');
  await send({ type: 'GET_METADATA', index: 5 });
  const m = drain('METADATA')[0];
  assert.equal(m.row.Title, 'Song 5');
});
