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
