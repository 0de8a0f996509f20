package graft.api

/** Static single-page project viewer served by [[Api]] — the headless
  * replacement for the reference's Dash GUI
  * (ref: apps/project_viewer/app.py:1-216). The page drives exactly the
  * three read endpoints the Dash app calls (app.py:193-204):
  * `GET /projects`, `GET /projects/{id}/dimensions`,
  * `GET /dimensions/records/{id}` — select a project, browse its
  * dimensions grouped by category, click one to page through its records
  * with a substring filter (the Dash DataTable's filter box, app.py:150+).
  * No framework, no build step, no external assets: one HTML string on
  * the same server, so the viewer works wherever the API does.
  */
object ViewerPage {

  val html: String =
    """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>graft project viewer</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 2rem; color: #222; }
  h1 { font-size: 1.3rem; }
  h2 { font-size: 1.05rem; margin-top: 1.5rem; }
  select, input { font: inherit; padding: 0.25rem 0.4rem; margin: 0.25rem 0; }
  table { border-collapse: collapse; margin-top: 0.5rem; }
  th, td { border: 1px solid #bbb; padding: 0.25rem 0.6rem; text-align: left; }
  th { background: #f0f0f0; cursor: default; }
  tr.dim { cursor: pointer; }
  tr.dim:hover { background: #eef5ff; }
  tr.selected { background: #dcebff; }
  .muted { color: #777; font-size: 0.9rem; }
  #error { color: #a00; white-space: pre-wrap; }
</style>
</head>
<body>
<h1>graft project viewer</h1>
<div id="error"></div>
<label>Project:
  <select id="project"></select>
</label>
<h2>Dimensions <span class="muted">(click a row to load its records)</span></h2>
<table id="dims"><thead><tr><th>dimension_id</th><th>name</th><th>category</th></tr></thead>
<tbody></tbody></table>
<h2 id="recTitle" style="display:none">Records</h2>
<input id="filter" placeholder="filter substring…" style="display:none">
<table id="recs"><thead></thead><tbody></tbody></table>
<script>
"use strict";
const $ = id => document.getElementById(id);
const fail = msg => { $("error").textContent = msg; };
// escape EVERYTHING interpolated into innerHTML — record values and
// dimension metadata are data, and data containing markup must render as
// text, not execute (the reference's Dash DataTable escapes cell content)
const esc = v => String(v).replace(/[&<>"']/g, ch =>
  ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;","'":"&#39;"}[ch]));
async function getJson(path) {
  const r = await fetch(path);
  const body = await r.json();
  if (!r.ok) throw new Error(path + " -> " + r.status + ": " + JSON.stringify(body));
  return body;
}
let records = [], columns = [];
function renderRecords() {
  const needle = $("filter").value.toLowerCase();
  const rows = records.filter(row =>
    !needle || columns.some(c => String(row[c] ?? "").toLowerCase().includes(needle)));
  $("recs").querySelector("thead").innerHTML =
    "<tr>" + columns.map(c => "<th>" + esc(c) + "</th>").join("") + "</tr>";
  $("recs").querySelector("tbody").innerHTML = rows.slice(0, 500).map(row =>
    "<tr>" + columns.map(c => "<td>" + esc(row[c] ?? "") + "</td>").join("") + "</tr>"
  ).join("");
  $("recTitle").textContent =
    "Records (" + rows.length + (rows.length > 500 ? ", showing 500" : "") + ")";
}
async function loadRecords(dim, tr) {
  document.querySelectorAll("tr.selected").forEach(r => r.classList.remove("selected"));
  tr.classList.add("selected");
  const body = await getJson("/dimensions/records/" + encodeURIComponent(dim));
  records = body.records || [];
  columns = records.length ? Object.keys(records[0]) : [];
  $("recTitle").style.display = "";
  $("filter").style.display = "";
  renderRecords();
}
async function loadDimensions(projectId) {
  const body = await getJson("/projects/" + encodeURIComponent(projectId) + "/dimensions");
  const tbody = $("dims").querySelector("tbody");
  tbody.innerHTML = "";
  (body.dimensions || []).forEach(d => {
    const tr = document.createElement("tr");
    tr.className = "dim";
    tr.innerHTML = "<td>" + esc(d.dimension_id) + "</td><td>" + esc(d.name) +
      "</td><td>" + esc(d.category) + "</td>";
    tr.onclick = () => loadRecords(d.dimension_id, tr).catch(e => fail(e.message));
    tbody.appendChild(tr);
  });
}
async function init() {
  const body = await getJson("/projects");
  const sel = $("project");
  (body.projects || []).forEach(p => {
    const o = document.createElement("option");
    o.value = o.textContent = p.project_id;
    sel.appendChild(o);
  });
  sel.onchange = () => loadDimensions(sel.value).catch(e => fail(e.message));
  if (sel.value) await loadDimensions(sel.value);
}
$("filter").oninput = renderRecords;
init().catch(e => fail(e.message));
</script>
</body>
</html>
"""
}
