"""Browser viewer — the reference's web target redesigned for a TPU backend.

The reference ships the SAME app twice: native, and compiled to wasm for the
browser (treee-wasm/src/lib.rs:6-17 bootstraps ``treee::try_main`` under
wasm-bindgen; index.html loads it), with the web build hard-capped at 15M
points because the whole cloud must fit the tab's memory (laz.rs:49-62).

A TPU framework inverts that split: the cloud and the renderer live on the
chip, and the browser is a thin remote display — no point data ever leaves
the device, so the web surface scales to whatever the chip (or the tiled
pipeline, parallel/tiles.py) holds instead of 15M.  ``serve.py`` is that
inversion, a dependency-free stdlib HTTP server over the Session/REPL:

  GET  /             one-file viewer page (canvas + mouse/keyboard mapping)
  GET  /frame.png    current frame as PNG (full / LOD / focused view)
  POST /cmd          one REPL command line -> its text output
  GET  /info         session stats JSON

The page introduces NO new interaction semantics: every gesture maps to the
same REPL commands (repl.py), which map 1:1 to the reference's widgets and
mouse dispatch (interactive/mod.rs:713-954).  Start it with
``python -m treee_tpu.app --demo --serve 8080``.
"""

from __future__ import annotations

import io
import json
import struct
import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from .repl import Repl


def png_encode(img: np.ndarray) -> bytes:
    """Minimal RGB8 PNG writer (stdlib zlib; no imaging dependency).

    The viewer page polls frames, so encode speed matters more than ratio:
    filter type 0 on every row + one zlib deflate (level 6) keeps a 720p
    frame ~1-3 ms on the host.
    """
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    raw = np.empty((h, 1 + w * 3), np.uint8)
    raw[:, 0] = 0  # per-row filter byte: None
    raw[:, 1:] = img.reshape(h, w * 3)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


_PAGE = """<!doctype html>
<meta charset="utf-8"><title>treee-tpu</title>
<style>
 body{margin:0;background:#111;color:#ddd;font:13px monospace;display:flex}
 #left{flex:1;display:flex;flex-direction:column;align-items:center}
 #frame{max-width:100%;image-rendering:pixelated;cursor:crosshair;
        border:1px solid #333;margin:8px}
 #panel{width:340px;padding:8px;display:flex;flex-direction:column;gap:6px}
 button,select,input{font:inherit;background:#222;color:#ddd;
        border:1px solid #444;padding:2px 6px}
 button.on{background:#264;border-color:#6a6}
 #log{flex:1;overflow-y:auto;white-space:pre-wrap;border:1px solid #333;
      padding:4px;min-height:120px}
 .row{display:flex;gap:4px;flex-wrap:wrap;align-items:center}
</style>
<div id=left><img id=frame></div>
<div id=panel>
 <div class=row id=modes></div>
 <div class=row>
  <label><input type=checkbox id=lod> lod</label>
  <label><input type=checkbox id=deleted> deleted</label>
  <label><input type=checkbox id=focus> focus</label>
  <select id=display><!--DISPLAY_OPTIONS--></select>
 </div>
 <div class=row>
  <label><input type=checkbox id=hull> hull</label>
  <label><input type=checkbox id=rbv> rbv</label>
  <label><input type=checkbox id=axis> axis</label>
 </div>
 <div class=row>d <input id=dist size=4 value=0.75>
  <button onclick="cmd('distance '+el('dist').value)">re-segment</button>
  <span id=stats></span></div>
 <input id=cli placeholder="command (try: help)">
 <div id=log></div>
</div>
<script>
const el=id=>document.getElementById(id);
const img=el('frame'); let focusMode=false;
function refresh(){
  img.src='/frame.png?focus='+(focusMode?1:0)+'&t='+Date.now();}
async function cmd(line,quiet){
  const r=await fetch('/cmd',{method:'POST',body:line});
  const j=await r.json();
  if(!quiet&&j.output)el('log').textContent+=j.output;
  el('log').scrollTop=1e9; refresh(); stats(); return j;}
async function stats(){
  const j=await(await fetch('/info')).json();
  el('stats').textContent=j.points.toLocaleString()+' pts / '
    +j.segments+' seg / sel '+(j.selected??'-');}
/* mode radio (Modus widget, interactive/mod.rs:958-968) */
const MODES=['view','draw','combine','spawn','delete'];let mode='view';
for(const m of MODES){const b=document.createElement('button');
  b.textContent=m;b.id='m_'+m;
  b.onclick=()=>{mode=m;cmd('mode '+m,true);
    MODES.forEach(x=>el('m_'+x).classList.toggle('on',x===mode));};
  el('modes').appendChild(b);}
el('m_view').classList.add('on');
/* mouse: drag rotates, click dispatches per mode, shift-drag brushes,
   wheel zooms (program.rs:412-450, mod.rs:713-954) */
let down=null,moved=false;
function pix(e){const r=img.getBoundingClientRect();
  return[(e.clientX-r.left)*img.naturalWidth/r.width,
         (e.clientY-r.top)*img.naturalHeight/r.height];}
img.onmousedown=e=>{down=[e.clientX,e.clientY];moved=false;e.preventDefault()};
img.onmousemove=e=>{
  if(!down)return;
  const dx=e.clientX-down[0],dy=e.clientY-down[1];
  if(Math.abs(dx)+Math.abs(dy)<3)return;
  moved=true;down=[e.clientX,e.clientY];
  if(e.shiftKey){const[p,q]=pix(e);cmd(`drag ${p|0} ${q|0}`,true);}
  else cmd(`rotate ${dx*4} ${dy*4}`,true);};
img.onmouseup=e=>{
  if(down&&!moved){const[p,q]=pix(e);cmd(`click ${p|0} ${q|0}`);}
  down=null;};
img.onwheel=e=>{e.preventDefault();cmd('scroll '+(e.deltaY>0?1:-1),true);};
window.onkeydown=e=>{
  if(e.target===el('cli'))return;
  if('wasdqe'.includes(e.key))cmd('key '+e.key,true);};
/* widgets -> commands */
el('lod').onchange=e=>cmd('lod '+(e.target.checked?'on':'off'),true);
el('deleted').onchange=e=>cmd('showdeleted '+(e.target.checked?'on':'off'),true);
el('focus').onchange=e=>{focusMode=e.target.checked;refresh();};
el('display').onchange=e=>cmd('display '+e.target.value,true);
for(const o of['hull','rbv','axis'])
  el(o).onchange=e=>cmd(`overlay ${o} `+(e.target.checked?'on':'off'),true);
el('cli').onkeydown=e=>{
  if(e.key==='Enter'){el('log').textContent+='> '+e.target.value+'\\n';
    cmd(e.target.value);e.target.value='';}};
refresh();stats();
</script>
"""


class ViewerServer:
    """Threaded HTTP server over one :class:`Repl` (and its Session).

    JAX dispatch is single-client over the axon tunnel and the Repl is
    stateful, so every request that touches the session serializes through
    ``self.lock``; the HTTP accept loop itself stays threaded so a slow
    frame doesn't wedge the page load.
    """

    def __init__(self, session, host: str = "127.0.0.1", port: int = 8080):
        self.repl = Repl(session, out=io.StringIO())
        self.lock = threading.Lock()
        # progressive feedback: long commands (open / add / distance) hold
        # the lock AND the device; they push preview frames here and
        # frame_png serves them lock-free so the page shows imagery before
        # the pipeline finishes (reference: live chunk streaming,
        # loading.rs:91-115, segmenting.rs:209-224)
        self._preview_png: bytes | None = None
        self._last_png: bytes | None = None
        self.repl.preview_hook = self._push_preview
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet; the REPL log is the record
                pass

            def _send(self, code: int, ctype: str, body: bytes) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/":
                    self._send(200, "text/html", viewer.page().encode())
                elif url.path == "/frame.png":
                    q = parse_qs(url.query)
                    focus = q.get("focus", ["0"])[0] == "1"
                    try:
                        png = viewer.frame_png(focus)
                    except Exception as e:  # surface in the tab, keep serving
                        self._send(500, "text/plain", str(e).encode())
                        return
                    self._send(200, "image/png", png)
                elif url.path == "/info":
                    self._send(200, "application/json",
                               json.dumps(viewer.info()).encode())
                else:
                    self._send(404, "text/plain", b"not found")

            def do_POST(self):
                if urlparse(self.path).path != "/cmd":
                    self._send(404, "text/plain", b"not found")
                    return
                n = int(self.headers.get("Content-Length", 0))
                line = self.rfile.read(n).decode()
                out = viewer.command(line)
                self._send(200, "application/json", json.dumps(out).encode())

        self.httpd = ThreadingHTTPServer((host, port), Handler)

    # ---- session access (all under the lock) ------------------------------

    def page(self) -> str:
        """Viewer page with the display selector limited to what this scan
        can actually show (the REPL rejects absent attributes, repl.py
        `display`; offering them in the dropdown would just no-op)."""
        with self.lock:  # 'add scan.las' replaces session.attributes
            opts = ["classification", "expansion", "height", "curve",
                    "shaded", *sorted(self.repl.s.attributes), "hag"]
        return _PAGE.replace(
            "<!--DISPLAY_OPTIONS-->",
            "".join(f"<option>{o}</option>" for o in opts),
        )

    def command(self, line: str) -> dict:
        with self.lock:
            self.repl.out = io.StringIO()
            alive = self.repl.handle(line)
            return {"ok": True, "output": self.repl.out.getvalue(),
                    "quit": not alive}

    def _push_preview(self, img: np.ndarray) -> None:
        self._preview_png = png_encode(np.asarray(img))

    def frame_png(self, focus: bool = False) -> bytes:
        if not self.lock.acquire(blocking=False):
            # a long command holds the session: serve the freshest preview
            # (or the last real frame) instead of wedging the poll loop
            cached = self._preview_png or self._last_png
            if cached is not None:
                return cached
            self.lock.acquire()  # nothing cached yet: wait like before
        try:
            png = self._frame_png_locked(focus)
            self._last_png = png
            # a real frame supersedes any pushed preview; keeping the old
            # preview would flash an outdated coarse image during the NEXT
            # lock-holding command that pushes none (inventory, compare, ...)
            self._preview_png = None
            return png
        finally:
            self.lock.release()

    def _frame_png_locked(self, focus: bool = False) -> bytes:
        r = self.repl
        if focus and r.selected is not None:
            img = r.s.render_focus(
                r.selected, display=r.display,
                show_hull=r.overlays["hull"],
                show_rbv=r.overlays["rbv"],
                show_axis=r.overlays["axis"],
                hull_include=r.hull_include,
                rbv_slices=r.rbv_opts["slices"],
                rbv_sectors=r.rbv_opts["sectors"],
                rbv_method=r.rbv_opts["method"],
                rbv_symmetric=r.rbv_opts["symmetric"],
                axis_algo=r.axis_algo,
            )
        else:
            from .repl import ATTR_DISPLAYS

            prop, pal = (None, None)
            if r.display in ATTR_DISPLAYS:
                prop, pal = r.s.attribute_prop(r.display)
            elif r.display == "hag":
                prop = r.s.hag_prop()
            img = r.s.render(use_lod=r.use_lod,
                             show_deleted=r.show_deleted,
                             prop=prop, palette=pal)
        return png_encode(np.asarray(img))

    def info(self) -> dict:
        with self.lock:
            s = self.repl.s
            n_seg = (
                int(np.asarray(s.table.present).sum())
                if s.table is not None else 0
            )
            return {
                "points": int(s.cloud.count),
                "segments": n_seg,
                "mode": self.repl.mode,
                "selected": self.repl.selected,
                "lod": self.repl.use_lod,
                "width": s.config.render.width,
                "height": s.config.render.height,
            }

    # ---- lifecycle ---------------------------------------------------------

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
