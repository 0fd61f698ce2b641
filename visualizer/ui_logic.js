// Pure UI logic for the visualizer app — DOM-free, golden-pinned.
//
// The reference keeps all of this inline in top-level DOM code
// (/root/reference/visualizer/app.js:171-339), which makes it untestable.
// Factoring the pure functions out lets the node suite
// (visualizer/test/ui_logic.test.mjs) and the python goldens
// (tests/test_visualizer_fixtures.py via tools/make_visualizer_fixtures.py)
// pin the exact same semantics app.js renders with: color-mode assignment,
// rainbow-by-date bucketing, categorical level maps, legend entries, filter
// suggestions, tooltip field selection, view fitting, density binning.

export const CLUSTER_COLORS = [
  '#4e79a7', '#f28e2b', '#e15759', '#76b7b2', '#59a14f', '#edc948',
  '#b07aa1', '#ff9da7', '#9c755f', '#bab0ab', '#86bcb6', '#d37295',
  '#fabfd2', '#b6992d', '#499894', '#79706e',
];

// rainbow-by-date: points arrive date-sorted, so index position maps to a
// 0..300deg hue sweep (violet excluded so the ends stay distinguishable)
export function dateRainbowHsl(i, n) {
  const t = n > 1 ? i / (n - 1) : 0;
  return `hsl(${Math.round(t * 300)}, 70%, 50%)`;
}

// distinct value -> palette index, in first-appearance order
export function buildFieldLevels(values) {
  const levels = new Map();
  for (const v of values) {
    const key = String(v);
    if (!levels.has(key)) levels.set(key, levels.size);
  }
  return levels;
}

// color of point i under a state {colorMode, n, labels, fieldValues, fieldLevels}
export function pointColor(state, i) {
  if (state.colorMode === 'date') {
    return dateRainbowHsl(i, state.n);
  }
  if (state.colorMode !== 'cluster' && state.fieldValues) {
    const level = state.fieldLevels.get(String(state.fieldValues[i])) ?? 0;
    return CLUSTER_COLORS[level % CLUSTER_COLORS.length];
  }
  return CLUSTER_COLORS[(state.labels?.[i] ?? 0) % CLUSTER_COLORS.length];
}

// legend swatches for a categorical color mode (first `max` levels)
export function legendEntries(fieldLevels, max = 16) {
  return Array.from(fieldLevels.entries())
    .slice(0, max)
    .map(([v, lvl]) => ({ value: v.slice(0, 20), color: CLUSTER_COLORS[lvl % CLUSTER_COLORS.length] }));
}

// the color-mode <select> options: fixed modes + the categorical columns
export function colorModeOptions(categorical) {
  return ['cluster', 'date', ...(categorical || [])];
}

// filter-box datalist suggestions (trailing space so the user types the op)
export function columnSuggestions(columns) {
  return columns.map((c) => `${c} `);
}

// tooltip/details fields: non-empty entries, capped, values truncated
export function metadataEntries(row, max = 18) {
  return Object.entries(row)
    .filter(([, v]) => v != null && v !== '')
    .slice(0, max)
    .map(([k, v]) => [k, String(v).slice(0, 60)]);
}

// neighbor list display name
export function neighborLabel(row, idx) {
  const r = row || {};
  return r.Title || r.BeatmapFile || `#${idx}`;
}

// point radius by dataset size (canvas renderer)
export function pointRadius(n) {
  return n > 20000 ? 1 : n > 2000 ? 2 : 3.5;
}

// data bounds with 5% padding (degenerate ranges pad by 1)
export function computeView(points, n) {
  let minX = Infinity, maxX = -Infinity, minY = Infinity, maxY = -Infinity;
  for (let i = 0; i < n; i++) {
    const x = points[i * 2], y = points[i * 2 + 1];
    if (x < minX) minX = x;
    if (x > maxX) maxX = x;
    if (y < minY) minY = y;
    if (y > maxY) maxY = y;
  }
  const padX = (maxX - minX) * 0.05 || 1, padY = (maxY - minY) * 0.05 || 1;
  return { minX: minX - padX, maxX: maxX + padX, minY: minY - padY, maxY: maxY + padY };
}

export function toScreen(x, y, view, w, h) {
  return [
    ((x - view.minX) / (view.maxX - view.minX)) * w,
    h - ((y - view.minY) / (view.maxY - view.minY)) * h,
  ];
}

// density view: bx x by bin counts over the screen projection
export function densityBins(points, n, view, w, h, bx = 64, by = 48) {
  const bins = new Float64Array(bx * by);
  for (let i = 0; i < n; i++) {
    const [sx, sy] = toScreen(points[i * 2], points[i * 2 + 1], view, w, h);
    const gx = Math.min(bx - 1, Math.max(0, Math.floor((sx / w) * bx)));
    const gy = Math.min(by - 1, Math.max(0, Math.floor((sy / h) * by)));
    bins[gy * bx + gx]++;
  }
  return bins;
}

// log-scaled intensity of one bin in 0..1 (0 for empty bins)
export function densityIntensity(v, maxLog) {
  return v ? Math.log1p(v) / (maxLog || 1) : 0;
}

export function densityCellStyle(v, maxLog) {
  const t = densityIntensity(v, maxLog);
  return `hsla(${240 - 240 * t}, 80%, 50%, ${0.25 + 0.75 * t})`;
}
