// Main-thread UI: rendering, color modes, details panel, search/filter.
//
// Parity surface with the reference app (/root/reference/visualizer/app.js):
// scatter plot with cluster/date coloring, hover/click details, neighbor
// list, filter queries, search, CSV export. Rendering uses Plotly when the
// CDN is reachable and falls back to a built-in canvas renderer otherwise
// (which also handles >100k points better).

import {
  pointColor as pointColorOf, buildFieldLevels, legendEntries,
  colorModeOptions, columnSuggestions, metadataEntries, neighborLabel,
  pointRadius, computeView as computeViewOf, toScreen as toScreenOf,
  densityBins, densityCellStyle,
} from './ui_logic.js';

const worker = new Worker('./worker.js', { type: 'module' });

const state = {
  n: 0,
  points: null,
  labels: null,
  indices: [],
  columns: [],
  colorMode: 'cluster',
  fieldValues: null,   // column values when colorMode is a metadata field
  fieldLevels: null,   // distinct value -> palette index
  density: false,
  selected: null,
  haveData: false,
};

const $ = (id) => document.getElementById(id);
const status = (msg) => { $('status').textContent = msg; };

// ----------------------- color maps (pure logic lives in ui_logic.js)

const pointColor = (i) => pointColorOf(state, i);

function setColorField(values) {
  state.fieldValues = values;
  state.fieldLevels = buildFieldLevels(values);
  renderLegend();
  render();
}

function renderLegend() {
  const el = $('legend');
  if (!el) return;
  if (state.colorMode === 'cluster' || state.colorMode === 'date' || !state.fieldLevels) {
    el.innerHTML = '';
    return;
  }
  el.innerHTML = legendEntries(state.fieldLevels)
    .map((e) =>
      `<span class="legend-item"><span class="swatch" style="background:${e.color}"></span>${e.value}</span>`)
    .join(' ');
}

// --------------------------------------------------------------- renderer

let canvas = null;
let view = null; // {minX, maxX, minY, maxY}

function computeView() {
  view = computeViewOf(state.points, state.n);
}

const toScreen = (x, y, w, h) => toScreenOf(x, y, view, w, h);

function renderDensityCanvas(ctx, w, h) {
  // 64x48 bin grid, log-scaled alpha — reference app's density view
  const bx = 64, by = 48;
  const bins = densityBins(state.points, state.n, view, w, h, bx, by);
  const maxLog = Math.log1p(Math.max(...bins));
  const cw = w / bx, ch = h / by;
  for (let gy = 0; gy < by; gy++)
    for (let gx = 0; gx < bx; gx++) {
      const v = bins[gy * bx + gx];
      if (!v) continue;
      ctx.fillStyle = densityCellStyle(v, maxLog);
      ctx.fillRect(gx * cw, gy * ch, cw + 1, ch + 1);
    }
}

function renderCanvas() {
  const plot = $('plot');
  if (!canvas) {
    plot.innerHTML = '';
    canvas = document.createElement('canvas');
    canvas.id = 'scatter-canvas';
    plot.appendChild(canvas);
    canvas.addEventListener('click', onCanvasClick);
  }
  const w = (canvas.width = plot.clientWidth || 800);
  const h = (canvas.height = plot.clientHeight || 600);
  const ctx = canvas.getContext('2d');
  ctx.clearRect(0, 0, w, h);
  computeView();
  if (state.density) {
    renderDensityCanvas(ctx, w, h);
    return;
  }
  const r = pointRadius(state.n);
  for (let i = 0; i < state.n; i++) {
    const [sx, sy] = toScreen(state.points[i * 2], state.points[i * 2 + 1], w, h);
    ctx.fillStyle = pointColor(i);
    ctx.beginPath();
    ctx.arc(sx, sy, r, 0, 6.2832);
    ctx.fill();
  }
  if (state.selected != null) {
    const [sx, sy] = toScreen(state.points[state.selected * 2], state.points[state.selected * 2 + 1], w, h);
    ctx.strokeStyle = '#000';
    ctx.lineWidth = 2;
    ctx.beginPath();
    ctx.arc(sx, sy, r + 4, 0, 6.2832);
    ctx.stroke();
  }
}

function onCanvasClick(ev) {
  const rect = canvas.getBoundingClientRect();
  const px = ev.clientX - rect.left, py = ev.clientY - rect.top;
  let best = -1, bestD = 15 * 15;
  for (let i = 0; i < state.n; i++) {
    const [sx, sy] = toScreen(state.points[i * 2], state.points[i * 2 + 1], canvas.width, canvas.height);
    const d = (sx - px) ** 2 + (sy - py) ** 2;
    if (d < bestD) { bestD = d; best = i; }
  }
  if (best >= 0) selectPoint(best);
}

function renderPlotly() {
  const x = [], y = [], colors = [];
  for (let i = 0; i < state.n; i++) {
    x.push(state.points[i * 2]);
    y.push(state.points[i * 2 + 1]);
    colors.push(pointColor(i));
  }
  const traces = state.density
    ? [{ x, y, type: 'histogram2dcontour', colorscale: 'Viridis', ncontours: 18 }]
    : [{
        x, y, mode: 'markers', type: 'scattergl',
        marker: { color: colors, size: 5 },
        hoverinfo: 'text',
      }];
  window.Plotly.newPlot('plot', traces, { margin: { t: 10 }, dragmode: 'pan' }, { responsive: true });
  if (!state.density) $('plot').on('plotly_click', (d) => selectPoint(d.points[0].pointIndex));
  canvas = null;
}

function render() {
  if (!state.haveData) return;
  if (window.Plotly && state.n <= 50000) renderPlotly();
  else renderCanvas();
}

// ------------------------------------------------------------ interaction

function selectPoint(i) {
  state.selected = i;
  const globalIdx = state.indices[i];
  worker.postMessage({ type: 'GET_METADATA', index: globalIdx });
  worker.postMessage({ type: 'FIND_NEIGHBORS', index: globalIdx, k: 10 });
  if (canvas) renderCanvas();
}

worker.onmessage = (e) => {
  const msg = e.data;
  switch (msg.type) {
    case 'READY':
      status('Worker ready. Load an embeddings file.');
      break;
    case 'DATA_READY': {
      state.n = msg.n;
      state.points = msg.points;
      state.labels = msg.labels;
      state.indices = msg.indices;
      state.columns = msg.columns;
      state.haveData = true;
      state.selected = null;
      const sel = $('color-mode');
      const current = sel.value;
      sel.innerHTML = colorModeOptions(msg.categorical)
        .map((c) => `<option value="${c}">${c === 'date' ? 'date (rainbow)' : c}</option>`).join('');
      if ([...sel.options].some((o) => o.value === current)) sel.value = current;
      state.colorMode = sel.value;
      const dl = $('column-suggestions');
      if (dl) dl.innerHTML = columnSuggestions(msg.columns).map((s) => `<option value="${s}"></option>`).join('');
      if (state.colorMode !== 'cluster' && state.colorMode !== 'date') {
        worker.postMessage({ type: 'GET_COLUMN', name: state.colorMode });
      } else {
        state.fieldValues = null;
        renderLegend();
      }
      status(`${msg.n} points (${msg.columns.length} metadata columns)`);
      render();
      break;
    }
    case 'COLUMN':
      if (msg.name === state.colorMode) setColorField(msg.values);
      break;
    case 'CLUSTERS':
      state.labels = msg.labels;
      render();
      break;
    case 'METADATA': {
      const info = metadataEntries(msg.row)
        .map(([k, v]) => `<div><b>${k}</b>: ${v}</div>`)
        .join('');
      $('point-info').innerHTML = info || 'No metadata.';
      break;
    }
    case 'NEIGHBORS': {
      $('neighbors').innerHTML = msg.indices
        .map((idx, j) => {
          const name = neighborLabel(msg.rows[j], idx);
          return `<li data-idx="${idx}">${name} <span class="dist">${msg.distances[j].toFixed(3)}</span></li>`;
        })
        .join('');
      break;
    }
    case 'SEARCH_RESULTS':
      if (msg.indices.length > 0) {
        const local = state.indices.indexOf(msg.indices[0]);
        if (local >= 0) selectPoint(local);
        status(`${msg.indices.length} search hits; selected first.`);
      } else {
        status('No search results.');
      }
      break;
    case 'CSV': {
      const blob = new Blob([msg.text], { type: 'text/csv' });
      const a = document.createElement('a');
      a.href = URL.createObjectURL(blob);
      a.download = 'embeddings_export.csv';
      a.click();
      break;
    }
    case 'LOG':
      console.log('[worker]', msg.message);
      break;
    case 'ERROR':
      status('Error: ' + msg.message);
      break;
  }
};

// ----------------------------------------------------------------- wiring

$('file-input').addEventListener('change', async (e) => {
  const file = e.target.files[0];
  if (!file) return;
  status('Loading ' + file.name + '...');
  const buffer = await file.arrayBuffer();
  worker.postMessage({ type: 'LOAD_FILE', buffer, name: file.name, k: +$('k-slider').value }, [buffer]);
});

$('color-mode').addEventListener('change', (e) => {
  state.colorMode = e.target.value;
  if (state.colorMode !== 'cluster' && state.colorMode !== 'date') {
    worker.postMessage({ type: 'GET_COLUMN', name: state.colorMode });
  } else {
    state.fieldValues = null;
    renderLegend();
    render();
  }
});

const densityEl = $('density');
if (densityEl) densityEl.addEventListener('change', (e) => {
  state.density = e.target.checked;
  render();
});

$('k-slider').addEventListener('input', (e) => { $('k-value').textContent = e.target.value; });
$('recluster').addEventListener('click', () => worker.postMessage({ type: 'RECLUSTER', k: +$('k-slider').value }));
$('apply-filter').addEventListener('click', () =>
  worker.postMessage({ type: 'FILTER_AND_PROJECT', query: $('filter').value, projection: $('projection').value })
);
$('projection').addEventListener('change', () =>
  worker.postMessage({ type: 'FILTER_AND_PROJECT', query: $('filter').value, projection: $('projection').value })
);
$('search').addEventListener('keydown', (e) => {
  if (e.key === 'Enter') worker.postMessage({ type: 'SEARCH', text: $('search').value });
});
$('export-csv').addEventListener('click', () => worker.postMessage({ type: 'EXPORT_CSV' }));
window.addEventListener('resize', () => { if (!window.Plotly) render(); });
