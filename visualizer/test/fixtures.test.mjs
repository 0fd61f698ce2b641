// Golden-fixture conformance: the worker pipeline must reproduce the SAME
// files the python/native suite asserts (tests/test_visualizer_fixtures.py).
// The goldens were computed by the native C++ core; the worker runs its
// pure-JS fallbacks here — matching outputs pin the cross-language
// contract (seeded-LCG k-means, power-iteration PCA, cosine kNN, query
// language) that the WASM build also implements.
//
// Run: node --test visualizer/test/
import test from 'node:test';
import assert from 'node:assert/strict';
import { readFile } from 'node:fs/promises';
import { fileURLToPath } from 'node:url';
import { dirname, join } from 'node:path';

const here = dirname(fileURLToPath(import.meta.url));

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

const datasetRaw = await readFile(join(here, 'fixtures', 'dataset.json'));
const goldens = JSON.parse(await readFile(join(here, 'fixtures', 'goldens.json'), 'utf8'));

test('LOAD_FILE reproduces the golden kmeans labels and PCA points', async () => {
  messages.length = 0;
  await send({
    type: 'LOAD_FILE',
    buffer: datasetRaw.buffer.slice(datasetRaw.byteOffset, datasetRaw.byteOffset + datasetRaw.byteLength),
    name: 'dataset.json',
    k: goldens.k,
  });
  const ready = drain('DATA_READY');
  assert.equal(ready.length, 1);
  const { n, labels, points } = ready[0];
  assert.equal(n, goldens.n);
  assert.deepEqual(Array.from(labels), goldens.kmeans_labels);
  for (let i = 0; i < n; i++) {
    assert.ok(Math.abs(points[i * 2] - goldens.pca_points[i][0]) < 2e-3, `x[${i}]`);
    assert.ok(Math.abs(points[i * 2 + 1] - goldens.pca_points[i][1]) < 2e-3, `y[${i}]`);
  }
});

test('FILTER_AND_PROJECT reproduces every golden query case', async () => {
  for (const { query, expected } of goldens.queries) {
    messages.length = 0;
    await send({ type: 'FILTER_AND_PROJECT', query, projection: 'pca' });
    const ready = drain('DATA_READY');
    assert.equal(ready.length, 1, query);
    assert.deepEqual(ready[0].indices, expected, query);
  }
  // restore the full view for later tests
  await send({ type: 'FILTER_AND_PROJECT', query: '', projection: 'pca' });
  drain('DATA_READY');
});

test('RECLUSTER reproduces the golden k=5 labels', async () => {
  messages.length = 0;
  await send({ type: 'RECLUSTER', k: 5 });
  const res = drain('CLUSTERS');
  assert.equal(res.length, 1);
  assert.deepEqual(Array.from(res[0].labels), goldens.kmeans_labels_k5);
  // restore the default k for any later test
  await send({ type: 'RECLUSTER', k: goldens.k });
  drain('CLUSTERS');
});

test('FIND_NEIGHBORS reproduces the golden kNN', async () => {
  messages.length = 0;
  await send({ type: 'FIND_NEIGHBORS', index: goldens.knn.query, k: goldens.knn.k });
  const res = drain('NEIGHBORS');
  assert.equal(res.length, 1);
  assert.deepEqual(Array.from(res[0].indices), goldens.knn.indices);
  for (let i = 0; i < goldens.knn.k; i++) {
    assert.ok(Math.abs(res[0].distances[i] - goldens.knn.distances[i]) < 1e-4, `dist[${i}]`);
  }
});

test('SEARCH hits the golden field', async () => {
  messages.length = 0;
  await send({ type: 'SEARCH', text: goldens.search.text });
  const res = drain('SEARCH_RESULTS');
  assert.equal(res.length, 1);
  assert.ok(res[0].indices.length > 0);
  // every hit's Creator contains the search text (fixture construction)
  const rows = JSON.parse(new TextDecoder().decode(datasetRaw));
  for (const i of res[0].indices) {
    assert.ok(String(rows[i][goldens.search.field]).includes(goldens.search.text));
  }
});

test('GET_METADATA reproduces the golden rows (absolute-indexed)', async () => {
  // with a filter active: the lookup must stay absolute-indexed
  await send({ type: 'FILTER_AND_PROJECT', query: 'Artist == Alpha', projection: 'pca' });
  drain('DATA_READY');
  for (const { index, row } of goldens.metadata_cases) {
    messages.length = 0;
    await send({ type: 'GET_METADATA', index });
    const res = drain('METADATA');
    assert.equal(res.length, 1);
    assert.equal(res[0].index, index);
    assert.deepEqual(res[0].row, row);
  }
  await send({ type: 'FILTER_AND_PROJECT', query: '', projection: 'pca' });
  drain('DATA_READY');
});

test('GET_COLUMN reproduces the golden values over active rows', async () => {
  for (const { name, filter, values } of goldens.column_cases) {
    await send({ type: 'FILTER_AND_PROJECT', query: filter, projection: 'pca' });
    drain('DATA_READY');
    messages.length = 0;
    await send({ type: 'GET_COLUMN', name });
    const res = drain('COLUMN');
    assert.equal(res.length, 1, name);
    assert.equal(res[0].name, name);
    assert.deepEqual(res[0].values, values, name);
  }
  await send({ type: 'FILTER_AND_PROJECT', query: '', projection: 'pca' });
  drain('DATA_READY');
});

test('EXPORT_CSV reproduces the golden filtered view', async () => {
  const g = goldens.export_csv;
  await send({ type: 'FILTER_AND_PROJECT', query: g.query, projection: 'pca' });
  drain('DATA_READY');
  messages.length = 0;
  await send({ type: 'EXPORT_CSV' });
  const res = drain('CSV');
  assert.equal(res.length, 1);
  const lines = res[0].text.split('\n');
  assert.equal(lines[0], g.header);
  assert.equal(lines.length - 1, g.n_rows);
  const nCols = g.header.split(',').length;
  for (let i = 0; i < g.n_rows; i++) {
    const cells = lines[i + 1].split(',');
    assert.equal(cells.length, nCols, `row ${i}`);
    // dataset cells carry no embedded commas, so a plain split is exact
    assert.equal(JSON.parse(cells[0]), g.titles[i], `title ${i}`);
    assert.equal(Number(cells[nCols - 3]), g.clusters[i], `cluster ${i}`);
    assert.ok(Math.abs(Number(cells[nCols - 2]) - g.xy[i][0]) < 2e-3, `x ${i}`);
    assert.ok(Math.abs(Number(cells[nCols - 1]) - g.xy[i][1]) < 2e-3, `y ${i}`);
  }
  await send({ type: 'FILTER_AND_PROJECT', query: '', projection: 'pca' });
  drain('DATA_READY');
});

// shared-LCG float32 stream — must match tools/make_visualizer_fixtures.py
// lcg_f32 bit for bit (same constants as analytics.cpp / worker.js)
function lcgF32(seed, count) {
  let state = seed >>> 0;
  const out = new Float32Array(count);
  for (let i = 0; i < count; i++) {
    state = (Math.imul(state, 1664525) + 1013904223) >>> 0;
    out[i] = state / 4294967296 - 0.5;
  }
  return out;
}

// LAST: loads a different (5001-row) dataset, clobbering the worker state
test('UMAP above the 5000-point cap falls back to PCA with a LOG', async () => {
  const g = goldens.umap_fallback;
  const flat = lcgF32(g.lcg_seed, g.n * g.d);
  const rows = [];
  for (let i = 0; i < g.n; i++) {
    rows.push({ embedding: Array.from(flat.subarray(i * g.d, (i + 1) * g.d)), Title: `r${i}` });
  }
  const buf = new TextEncoder().encode(JSON.stringify(rows)).buffer;
  await send({ type: 'LOAD_FILE', buffer: buf, name: 'big.json', k: goldens.k });
  drain('DATA_READY');
  messages.length = 0;
  await send({ type: 'FILTER_AND_PROJECT', query: '', projection: 'umap' });
  const logs = messages.filter((m) => m.type === 'LOG');
  assert.ok(
    logs.some((m) => m.message.includes(g.log_contains)),
    'fallback LOG missing'
  );
  const ready = drain('DATA_READY');
  assert.equal(ready.length, 1);
  assert.equal(ready[0].n, g.n);
  for (let i = 0; i < g.pca_head.length; i++) {
    assert.ok(Math.abs(ready[0].points[i * 2] - g.pca_head[i][0]) < 2e-3, `x[${i}]`);
    assert.ok(Math.abs(ready[0].points[i * 2 + 1] - g.pca_head[i][1]) < 2e-3, `y[${i}]`);
  }
});
