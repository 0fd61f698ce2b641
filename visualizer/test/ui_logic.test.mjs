// ui_logic.js conformance against the python-generated goldens
// (tools/make_visualizer_fixtures.py `ui` section) — the app layer's pure
// logic (color modes, legend, suggestions, tooltip fields, view/density
// math) pinned cross-language the same way the worker protocol already is.
//
// Run: node --test visualizer/test/
import test from 'node:test';
import assert from 'node:assert/strict';
import { readFile } from 'node:fs/promises';
import { fileURLToPath } from 'node:url';
import { dirname, join } from 'node:path';

import {
  CLUSTER_COLORS, dateRainbowHsl, buildFieldLevels, pointColor, legendEntries,
  colorModeOptions, columnSuggestions, metadataEntries, neighborLabel,
  pointRadius, computeView, toScreen, densityBins, densityIntensity,
} from '../ui_logic.js';

const here = dirname(fileURLToPath(import.meta.url));
const goldens = JSON.parse(await readFile(join(here, 'fixtures', 'goldens.json'), 'utf8'));
const dataset = JSON.parse(await readFile(join(here, 'fixtures', 'dataset.json'), 'utf8'));
const ui = goldens.ui;
const n = goldens.n;

const round = (x, d) => Number(x.toFixed(d));

test('date rainbow colors match the golden hsl strings', () => {
  assert.deepEqual(ui.sample_indices.map((i) => dateRainbowHsl(i, n)), ui.date_colors);
  assert.equal(dateRainbowHsl(0, 1), ui.date_color_n1);
});

test('cluster-mode point colors follow the golden kmeans labels', () => {
  const state = { colorMode: 'cluster', n, labels: goldens.kmeans_labels };
  assert.deepEqual(ui.sample_indices.map((i) => pointColor(state, i)), ui.cluster_colors);
  // no labels yet -> palette slot 0
  assert.equal(pointColor({ colorMode: 'cluster', n, labels: null }, 3), ui.cluster_color_no_labels);
});

test('categorical field levels, colors, and legend match', () => {
  const values = dataset.map((r) => r[ui.field_column]);
  const levels = buildFieldLevels(values);
  assert.deepEqual(Object.fromEntries(levels), ui.field_levels);
  const state = { colorMode: ui.field_column, n, fieldValues: values, fieldLevels: levels };
  assert.deepEqual(values.slice(0, 16).map((_, i) => pointColor(state, i)), ui.field_colors);
  assert.deepEqual(legendEntries(levels), ui.legend);
  // unknown value falls back to palette slot 0
  assert.equal(pointColor({ ...state, fieldValues: ['???'] }, 0), CLUSTER_COLORS[0]);
});

test('color-mode options and filter suggestions', () => {
  assert.deepEqual(colorModeOptions(ui.categorical_input), ui.color_mode_options);
  assert.deepEqual(colorModeOptions(null), ['cluster', 'date']);
  const columns = Object.keys(dataset[0]).filter((c) => c !== 'embedding');
  assert.deepEqual(columnSuggestions(columns), ui.column_suggestions);
});

test('tooltip metadata entries: null/empty filtered, capped, truncated', () => {
  assert.deepEqual(metadataEntries(ui.metadata_entries_case.row), ui.metadata_entries_case.expected);
});

test('neighbor labels', () => {
  for (const c of ui.neighbor_labels) {
    assert.equal(neighborLabel(c.row, c.idx), c.expected);
  }
});

test('point radius thresholds', () => {
  for (const [count, r] of ui.point_radius) assert.equal(pointRadius(count), r);
});

test('view fit, screen projection, density bins match the golden math', () => {
  const pts = Float64Array.from(goldens.pca_points.flat());
  const view = computeView(pts, n);
  for (const [k, v] of Object.entries(ui.screen.view)) {
    assert.equal(round(view[k], 6), v, `view.${k}`);
  }
  const { w, h } = ui.screen;
  for (const c of ui.screen.to_screen_cases) {
    const [sx, sy] = toScreen(pts[c.i * 2], pts[c.i * 2 + 1], view, w, h);
    assert.deepEqual([round(sx, 4), round(sy, 4)], c.xy, `to_screen ${c.i}`);
  }
  const bins = densityBins(pts, n, view, w, h);
  const nonzero = [];
  bins.forEach((v, j) => { if (v) nonzero.push([j, v]); });
  assert.deepEqual(nonzero, ui.screen.density_bins_nonzero);
  const maxLog = Math.log1p(Math.max(...bins));
  assert.equal(round(maxLog, 6), ui.screen.density_max_log);
  for (const [v, t] of ui.screen.density_intensities) {
    assert.equal(round(densityIntensity(v, maxLog), 6), t, `intensity of ${v}`);
  }
});
