// Main-thread UI: rendering, color modes, details panel, search/filter.
//
// Parity surface with the reference app (/root/reference/visualizer/app.js):
// scatter plot with cluster/date coloring, hover/click details, neighbor
// list, filter queries, search, CSV export. Rendering uses Plotly when the
// CDN is reachable and falls back to a built-in canvas renderer otherwise
// (which also handles >100k points better).

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

// ------------------------------------------------------------- color maps

const CLUSTER_COLORS = [
  '#4e79a7', '#f28e2b', '#e15759', '#76b7b2', '#59a14f', '#edc948',
  '#b07aa1', '#ff9da7', '#9c755f', '#bab0ab', '#86bcb6', '#d37295',
  '#fabfd2', '#b6992d', '#499894', '#79706e',
];

function pointColor(i) {
  if (state.colorMode === 'date') {
    const t = state.n > 1 ? i / (state.n - 1) : 0;
    return `hsl(${Math.round(t * 300)}, 70%, 50%)`;
  }
  if (state.colorMode !== 'cluster' && state.fieldValues) {
    const level = state.fieldLevels.get(String(state.fieldValues[i])) ?? 0;
    return CLUSTER_COLORS[level % CLUSTER_COLORS.length];
  }
  return CLUSTER_COLORS[(state.labels?.[i] ?? 0) % CLUSTER_COLORS.length];
}

function setColorField(values) {
  state.fieldValues = values;
  state.fieldLevels = new Map();
  for (const v of values) {
    const key = String(v);
    if (!state.fieldLevels.has(key)) state.fieldLevels.set(key, state.fieldLevels.size);
  }
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
  el.innerHTML = Array.from(state.fieldLevels.entries())
    .slice(0, 16)
    .map(([v, lvl]) =>
      `<span class="legend-item"><span class="swatch" style="background:${CLUSTER_COLORS[lvl % CLUSTER_COLORS.length]}"></span>${v.slice(0, 20)}</span>`)
    .join(' ');
}

// --------------------------------------------------------------- renderer

let canvas = null;
let view = null; // {minX, maxX, minY, maxY}

function computeView() {
  let minX = Infinity, maxX = -Infinity, minY = Infinity, maxY = -Infinity;
  for (let i = 0; i < state.n; i++) {
    const x = state.points[i * 2], y = state.points[i * 2 + 1];
    if (x < minX) minX = x;
    if (x > maxX) maxX = x;
    if (y < minY) minY = y;
    if (y > maxY) maxY = y;
  }
  const padX = (maxX - minX) * 0.05 || 1, padY = (maxY - minY) * 0.05 || 1;
  view = { minX: minX - padX, maxX: maxX + padX, minY: minY - padY, maxY: maxY + padY };
}

function toScreen(x, y, w, h) {
  return [
    ((x - view.minX) / (view.maxX - view.minX)) * w,
    h - ((y - view.minY) / (view.maxY - view.minY)) * h,
  ];
}

function renderDensityCanvas(ctx, w, h) {
  // 64x48 bin grid, log-scaled alpha — reference app's density view
  const bx = 64, by = 48;
  const bins = new Float64Array(bx * by);
  for (let i = 0; i < state.n; i++) {
    const [sx, sy] = toScreen(state.points[i * 2], state.points[i * 2 + 1], w, h);
    const gx = Math.min(bx - 1, Math.max(0, Math.floor((sx / w) * bx)));
    const gy = Math.min(by - 1, Math.max(0, Math.floor((sy / h) * by)));
    bins[gy * bx + gx]++;
  }
  const maxLog = Math.log1p(Math.max(...bins));
  const cw = w / bx, ch = h / by;
  for (let gy = 0; gy < by; gy++)
    for (let gx = 0; gx < bx; gx++) {
      const v = bins[gy * bx + gx];
      if (!v) continue;
      const t = Math.log1p(v) / (maxLog || 1);
      ctx.fillStyle = `hsla(${240 - 240 * t}, 80%, 50%, ${0.25 + 0.75 * t})`;
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
  const r = state.n > 20000 ? 1 : state.n > 2000 ? 2 : 3.5;
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
      sel.innerHTML = '<option value="cluster">cluster</option><option value="date">date (rainbow)</option>'
        + (msg.categorical || []).map((c) => `<option value="${c}">${c}</option>`).join('');
      if ([...sel.options].some((o) => o.value === current)) sel.value = current;
      state.colorMode = sel.value;
      const dl = $('column-suggestions');
      if (dl) dl.innerHTML = msg.columns.map((c) => `<option value="${c} "></option>`).join('');
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
      const info = Object.entries(msg.row)
        .filter(([, v]) => v != null && v !== '')
        .slice(0, 18)
        .map(([k, v]) => `<div><b>${k}</b>: ${String(v).slice(0, 60)}</div>`)
        .join('');
      $('point-info').innerHTML = info || 'No metadata.';
      break;
    }
    case 'NEIGHBORS': {
      $('neighbors').innerHTML = msg.indices
        .map((idx, j) => {
          const row = msg.rows[j] || {};
          const name = row.Title || row.BeatmapFile || `#${idx}`;
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
