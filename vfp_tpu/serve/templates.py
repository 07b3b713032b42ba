"""Minimal HTML pages for the service (jinja2-rendered).

Functional equivalents of the reference's templates (reference:
api/templates/upload.html, index.html, detect.html) — upload form, hls.js
player wired to /start-view + /view/{id}, and leak-detection form.
"""

from jinja2 import Environment

_env = Environment(autoescape=True)

_BASE = """<!doctype html><html><head><title>vfp-tpu {{ title }}</title>
<style>body{font-family:sans-serif;max-width:52rem;margin:2rem auto;padding:0 1rem}
nav a{margin-right:1rem}</style></head><body>
<nav><a href="/upload">Upload</a><a href="/view">Watch</a><a href="/detect">Detect leak</a>
<a href="/view-history">History</a></nav><h1>{{ title }}</h1>{{ body | safe }}</body></html>"""

_PAGES = {
    "upload": (
        "Upload & watermark",
        """<form id=f><input type=file name=file required>
<button>Upload</button></form><pre id=out></pre>
<script>
f.onsubmit = async (e) => {
  e.preventDefault();
  out.textContent = 'processing...';
  const r = await fetch('/upload', {method:'POST', body:new FormData(f)});
  out.textContent = JSON.stringify(await r.json(), null, 2);
};
</script>""",
    ),
    "view": (
        "Watch (fingerprinted per viewer)",
        """<input id=u placeholder=username><button onclick=start()>Start view</button>
<video id=v controls width=640></video><pre id=out></pre>
<script src="https://cdn.jsdelivr.net/npm/hls.js@latest"></script>
<script>
async function start(){
  const r = await fetch('/start-view', {method:'POST',
    headers:{'Content-Type':'application/json'},
    body: JSON.stringify({username:u.value})});
  const j = await r.json();
  out.textContent = JSON.stringify(j, null, 2);
  if (j.view_id && window.Hls && Hls.isSupported()){
    const h = new Hls(); h.loadSource('/view/'+j.view_id); h.attachMedia(v);
  }
}
</script>""",
    ),
    "detect": (
        "Trace a leaked segment",
        """<form id=f><input type=file name=file required>
<button>Detect</button></form><pre id=out></pre>
<script>
f.onsubmit = async (e) => {
  e.preventDefault();
  out.textContent = 'detecting...';
  const r = await fetch('/detect', {method:'POST', body:new FormData(f)});
  out.textContent = JSON.stringify(await r.json(), null, 2);
};
</script>""",
    ),
}


def render_page(name: str) -> str:
    title, body = _PAGES[name]
    return _env.from_string(_BASE).render(title=title, body=body)
