package graft.api

/** Static single-page registration UI served by [[Api]] at `/register` —
  * the headless replacement for the reference's ipywidgets registration
  * GUI (ref: dsgrid/apps/registration_gui.py:1-444: register-project and
  * register-and-submit-dataset buttons over config files, show-tables
  * buttons for projects/datasets/dimensions/mappings, and a log panel).
  *
  * Same design rules as [[ViewerPage]]: no framework, no build step, no
  * external assets, every interpolation into innerHTML routed through
  * `esc()`. The page drives two server surfaces:
  *   - `POST /registry/bulk` with the textarea's manifest JSON (the bulk
  *     manifest IS graft's registration config file — dimensions →
  *     mappings → datasets, validated server-side);
  *   - the three `GET /registry/<kind>` list endpoints for the GUI's
  *     "show tables" buttons, re-fetched after every registration so the
  *     lists reflect what just happened (the reference's
  *     _post_registration_handling refresh).
  */
object RegistrationPage {

  val html: String =
    """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>graft registration</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 2rem; color: #222; }
  h1 { font-size: 1.3rem; }
  h2 { font-size: 1.05rem; margin-top: 1.5rem; }
  textarea { font-family: ui-monospace, monospace; font-size: 0.85rem;
             width: 100%; max-width: 52rem; min-height: 14rem;
             padding: 0.5rem; box-sizing: border-box; }
  button { font: inherit; padding: 0.3rem 0.9rem; margin: 0.25rem 0.5rem 0.25rem 0; }
  table { border-collapse: collapse; margin-top: 0.5rem; }
  th, td { border: 1px solid #bbb; padding: 0.25rem 0.6rem; text-align: left; }
  th { background: #f0f0f0; }
  #log { font-family: ui-monospace, monospace; font-size: 0.85rem;
         white-space: pre-wrap; background: #f7f7f7; border: 1px solid #ddd;
         padding: 0.5rem; max-width: 52rem; min-height: 3rem; }
  .ok { color: #060; }
  .err { color: #a00; }
  .muted { color: #777; font-size: 0.9rem; }
</style>
</head>
<body>
<h1>graft registration</h1>
<h2>Bulk-register manifest <span class="muted">(dimensions &rarr; mappings &rarr; datasets; paths are server-side)</span></h2>
<textarea id="manifest" spellcheck="false">{
  // register dimensions first, then mappings, then datasets
  "dimensions": [
    // {"name": "geography", "records": "/abs/path/geo.parquet", "category": "base"}
  ],
  "mappings": [
    // {"name": "c2s", "table": "/abs/path/c2s.parquet",
    //  "type": "many_to_one_aggregation",
    //  "from_dimension": "geography", "to_dimension": "state"}
  ],
  "datasets": [
    // {"id": "ds", "load_data": "/abs/path/load.parquet",
    //  "dimensions": {"geography": "geography"}}
  ]
}</textarea>
<div>
  <button id="registerBtn">Register</button>
  <span class="muted">POSTs the manifest to /registry/bulk; already-registered names fail their step (the server journals completed steps for resume)</span>
</div>
<h2>Log</h2>
<div id="log">ready.</div>
<h2>Registered objects <span class="muted">(refreshed after each registration)</span></h2>
<div>
  <button data-kind="datasets">Show datasets</button>
  <button data-kind="dimensions">Show dimensions</button>
  <button data-kind="mappings">Show mappings</button>
</div>
<table id="objects" style="display:none"><thead><tr><th id="objKind"></th></tr></thead>
<tbody></tbody></table>
<script>
"use strict";
const $ = id => document.getElementById(id);
// escape EVERYTHING interpolated into innerHTML — registered names and
// server error text are data, and data containing markup must render as
// text, not execute (the ViewerPage rule)
const esc = v => String(v).replace(/[&<>"']/g, ch =>
  ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;","'":"&#39;"}[ch]));
function log(msg, cls) {
  const line = document.createElement("div");
  if (cls) line.className = cls;
  line.textContent = msg;
  $("log").appendChild(line);
}
async function showObjects(kind) {
  const r = await fetch("/registry/" + encodeURIComponent(kind));
  const body = await r.json();
  if (!r.ok || !Array.isArray(body)) {
    log("FAILED: " + (body && body.error ? body.error : "unexpected response"), "err");
    return;
  }
  const names = body;
  $("objKind").textContent = kind;
  $("objects").style.display = "";
  $("objects").querySelector("tbody").innerHTML =
    names.map(n => "<tr><td>" + esc(n) + "</td></tr>").join("") ||
      "<tr><td class=\"muted\">(none)</td></tr>";
}
document.querySelectorAll("button[data-kind]").forEach(b => {
  b.onclick = () => showObjects(b.dataset.kind)
    .catch(e => log(e.message, "err"));
});
$("registerBtn").onclick = async () => {
  const btn = $("registerBtn");
  btn.disabled = true; // the reference GUI disables its buttons while running
  log("registering…");
  try {
    const r = await fetch("/registry/bulk",
      {method: "POST", body: $("manifest").value});
    const body = await r.json();
    if (!r.ok) { log("FAILED: " + body.error, "err"); return; }
    log("registered: " + (body.registered.join(", ") || "(nothing)"), "ok");
    if (body.skipped.length) log("skipped (journaled): " + body.skipped.join(", "));
    const shown = $("objKind").textContent;
    if (shown) await showObjects(shown);
  } catch (e) {
    log("FAILED: " + e.message, "err");
  } finally {
    btn.disabled = false;
  }
};
</script>
</body>
</html>
"""
}
