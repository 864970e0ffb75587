"""Web panadapter: the reference GUI's role, served over HTTP.

The reference is an interactive receiver — MainWindow wires the waterfall
widget, VFO drag-tuning, demod menu, and audio sink into one GUI loop
(core/src/gui/main_window.cpp:31-709, widgets/waterfall.cpp). A TPU host
has no display, so this module serves the same surface to a browser:

- ``ReceiverEngine``: the DSP thread — source -> IQFrontEnd -> RadioChannel
  in ONE jitted step per block, FFT lines into a WaterfallDisplay
  (misc/waterfall.py = the widget's data plane), audio into a ring for
  HTTP streaming. Control changes apply between blocks and rebuild the
  jitted graph — the functional analog of tempStop/tempStart rewiring
  (core/src/dsp/block.h:47-65).
- ``WebUIServer``: stdlib ThreadingHTTPServer with a JSON control API
  (the SmGui remote-menu role, core/src/gui/smgui.h:8-60), binary
  spectrum/waterfall endpoints, and a progressive stereo PCM16 WAV audio
  stream (the audio_sink role, sink_modules/audio_sink).

No third-party dependencies; the page is a single inline HTML document
(canvas spectrum + waterfall, click-to-tune, demod/bandwidth/squelch/
volume controls, SNR meter).
"""

from __future__ import annotations

import json
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..utils.log import get_logger
from .waterfall import WaterfallDisplay

__all__ = ["ReceiverEngine", "WebUIServer", "serve_ui"]

log = get_logger("webui")

MODES = ["wfm", "nfm", "am", "usb", "lsb", "dsb", "cw"]


class ReceiverEngine:
    """Background receive chain feeding the web UI.

    One VFO (like ``cli run``), a spectrum branch, and an audio ring.
    Thread-safe: control via :meth:`control`, reads via :meth:`snapshot`/
    :meth:`read_fft`/:meth:`read_waterfall_rows`/:meth:`read_audio`.
    """

    AUDIO_RING_SECONDS = 4.0

    def __init__(self, source, mode: str = "wfm", offset: float = 0.0,
                 bandwidth: float | None = None, squelch: float | None = None,
                 audio_rate: float = 48000.0, fft_size: int = 16384,
                 fft_rate: float = 20.0, base_block: int = 262144,
                 waterfall_width: int = 1024, waterfall_height: int = 512,
                 realtime: bool = True):
        self.source = source
        self.samplerate = float(source.samplerate)
        self.audio_rate = float(audio_rate)
        self.fft_size = int(fft_size)
        self.fft_rate = float(fft_rate)
        self.base_block = int(base_block)
        self.realtime = realtime
        self.center_freq = float(getattr(source, "center_freq", 0.0) or 0.0)

        self.cfg = dict(mode=mode, offset=float(offset), bandwidth=bandwidth,
                        squelch=squelch, deemphasis=None)
        self.volume = 1.0
        self.muted = False

        self.lock = threading.Lock()
        self.waterfall = WaterfallDisplay(
            self.fft_size, data_width=waterfall_width,
            waterfall_height=waterfall_height,
            whole_bandwidth=self.samplerate)
        self.waterfall.select_vfo(self.cfg["offset"],
                                  self._effective_bandwidth())

        ring = int(self.AUDIO_RING_SECONDS * self.audio_rate)
        self._audio_ring = np.zeros((ring, 2), np.int16)
        self._audio_written = 0  # monotonically increasing frame counter
        self._audio_event = threading.Condition(self.lock)

        self._wf_total = 0  # monotonic count of FFT lines pushed
        self._controls: list[tuple[str, object]] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.blocks = 0
        self.samples = 0
        self.error: str | None = None
        self._build()

    # ---- chain construction ----

    def _effective_bandwidth(self) -> float:
        from ..models.radio import DEMOD_DEFAULTS
        bw = self.cfg["bandwidth"]
        if bw:
            return float(bw)
        d = DEMOD_DEFAULTS[self.cfg["mode"]]
        return float(d["bandwidth"] or d["if_rate"] or self.audio_rate)

    def _build(self):
        """(Re)build the jitted frontend+channel step for the current cfg."""
        import jax

        from ..models.radio import RadioChannel
        from ..signal_path import IQFrontEnd
        from ..utils.iq import device_state

        chan = RadioChannel(self.cfg["mode"], self.samplerate,
                            offset=self.cfg["offset"],
                            bandwidth=self.cfg["bandwidth"],
                            audio_rate=self.audio_rate,
                            squelch_level=self.cfg["squelch"],
                            deemphasis=self.cfg["deemphasis"])
        bm = int(chan.block_multiple)
        block = max(bm, (self.base_block // bm) * bm)
        frontend = IQFrontEnd(self.samplerate, fft_size=self.fft_size,
                              fft_rate=self.fft_rate, block_size=block)

        def step(state, x_split):
            x = jax.lax.complex(x_split[0], x_split[1])
            fe, (iq, fft) = frontend(state[0], x)
            cs, audio = chan(state[1], iq)
            return (fe, cs), (audio, fft)

        self._chan = chan
        self._block = block
        self._step = jax.jit(step)
        self._state = device_state(
            lambda: (frontend.init_state(), chan.init_state()))

    # ---- control plane ----

    def control(self, action: str, value=None):
        """Queue a control change; applied between blocks."""
        if action in ("set_volume", "set_muted"):
            with self.lock:
                if action == "set_volume":
                    self.volume = float(np.clip(value, 0.0, 1.0))
                else:
                    self.muted = bool(value)
            return
        if action in ("set_view", "auto_range", "set_range",
                      "set_fft_hold", "set_fft_smoothing"):
            with self.lock:
                wf = self.waterfall
                if action == "set_view":
                    wf.set_view(float(value[0]), float(value[1]))
                elif action == "auto_range":
                    wf.auto_range()
                elif action == "set_range":
                    wf.waterfall_min = float(value[0])
                    wf.waterfall_max = float(value[1])
                elif action == "set_fft_hold":
                    wf.set_fft_hold(bool(value))
                else:
                    wf.set_fft_smoothing(bool(value))
            return
        if action == "tune":
            # hardware retune (SourceManager.tune, signal_path/source.cpp)
            if hasattr(self.source, "tune"):
                self.source.tune(float(value))
                self.center_freq = float(value)
            return
        valid = {"set_offset", "set_mode", "set_bandwidth", "set_squelch",
                 "set_deemphasis"}
        if action not in valid:
            raise ValueError(f"unknown action {action!r}")
        if action == "set_mode" and value not in MODES:
            raise ValueError(f"unknown mode {value!r}")
        with self.lock:
            self._controls.append((action, value))

    def _apply_controls(self):
        with self.lock:
            pending, self._controls = self._controls, []
        if not pending:
            return
        for action, value in pending:
            if action == "set_offset":
                half = self.samplerate / 2.0
                self.cfg["offset"] = float(np.clip(value, -half, half))
            elif action == "set_mode":
                self.cfg["mode"] = str(value)
                self.cfg["bandwidth"] = None  # back to the mode default
            elif action == "set_bandwidth":
                self.cfg["bandwidth"] = None if value is None else float(value)
            elif action == "set_squelch":
                self.cfg["squelch"] = None if value is None else float(value)
            elif action == "set_deemphasis":
                self.cfg["deemphasis"] = value or None
        self._build()
        with self.lock:
            self.waterfall.select_vfo(self.cfg["offset"],
                                      self._effective_bandwidth())

    # ---- data plane ----

    def _run(self):
        from ..utils.iq import split_iq

        t_start = time.monotonic()
        sent = 0.0
        while not self._stop.is_set():
            try:
                self._apply_controls()
                iq = self.source.read(self._block)
                if len(iq) < self._block:
                    break
                self._state, (audio, fft) = self._step(
                    self._state, split_iq(iq))
                out = audio[0] if isinstance(audio, tuple) else audio
                out = np.asarray(out, np.float32)
                fft = np.asarray(fft)
            except Exception as e:  # surface to /api/state instead of dying
                self.error = f"{type(e).__name__}: {e}"
                log.error(f"engine: {self.error}")
                break
            if out.ndim == 1:
                out = np.stack([out, out], -1)
            with self.lock:
                vol = 0.0 if self.muted else self.volume ** 2  # sink.cpp gain
            pcm = np.clip(out * (vol * 32767.0), -32768, 32767).astype(np.int16)
            with self.lock:
                for line in fft:
                    self.waterfall.push_fft(line)
                self._wf_total += len(fft)
                self._write_audio(pcm)
                self.blocks += 1
                self.samples += self._block
            if self.realtime:
                sent += self._block / self.samplerate
                lag = sent - (time.monotonic() - t_start)
                if lag > 0.0:
                    time.sleep(lag)
                elif lag < -2.0:  # fell behind (compile hitch): resync clock
                    t_start = time.monotonic() - sent

    def _write_audio(self, pcm: np.ndarray):
        ring = self._audio_ring
        n = len(pcm)
        if n >= len(ring):
            pcm = pcm[-len(ring):]
            n = len(pcm)
        pos = self._audio_written % len(ring)
        first = min(n, len(ring) - pos)
        ring[pos:pos + first] = pcm[:first]
        ring[:n - first] = pcm[first:]
        self._audio_written += n
        self._audio_event.notify_all()

    def read_audio(self, cursor: int, max_frames: int = 48000,
                   timeout: float = 1.0) -> tuple[np.ndarray, int]:
        """Read stereo i16 frames from the ring starting at ``cursor``
        (a frame counter); blocks until data or timeout. Lagging cursors
        skip forward. Returns (frames, new_cursor)."""
        with self._audio_event:
            if cursor >= self._audio_written:
                self._audio_event.wait(timeout)
            ring = self._audio_ring
            end = self._audio_written
            cursor = max(cursor, end - len(ring))
            n = min(end - cursor, max_frames)
            if n <= 0:
                return np.zeros((0, 2), np.int16), cursor
            pos = cursor % len(ring)
            first = min(n, len(ring) - pos)
            out = np.concatenate([ring[pos:pos + first], ring[:n - first]])
            return out, cursor + n

    def read_fft(self):
        with self.lock:
            wf = self.waterfall
            return (wf.latest_fft.copy(),
                    wf.latest_fft_hold.copy() if wf.fft_hold else None,
                    wf.fft_lines)

    def read_waterfall_rows(self, since: int, max_rows: int = 256):
        """Framebuffer rows newer than line-counter ``since`` (newest
        first, matching the scrolling framebuffer). Returns
        (rows_abgr_u32, monotonic_line_counter)."""
        with self.lock:
            wf = self.waterfall
            rows = min(max(self._wf_total - since, 0), wf.waterfall_height,
                       max_rows)
            return wf.framebuffer[:rows].copy(), self._wf_total

    def snapshot(self) -> dict:
        with self.lock:
            wf = self.waterfall
            return {
                "samplerate": self.samplerate,
                "center_freq": self.center_freq,
                "audio_rate": self.audio_rate,
                "mode": self.cfg["mode"],
                "offset": self.cfg["offset"],
                "bandwidth": self._effective_bandwidth(),
                "squelch": self.cfg["squelch"],
                "deemphasis": self.cfg["deemphasis"],
                "volume": self.volume,
                "muted": self.muted,
                "modes": MODES,
                "fft_size": self.fft_size,
                "waterfall_width": wf.data_width,
                "waterfall_min": wf.waterfall_min,
                "waterfall_max": wf.waterfall_max,
                "view_offset": wf.view_offset,
                "view_bandwidth": wf.view_bandwidth,
                "vfo_level": wf.vfo_level,
                "vfo_snr": wf.vfo_snr,
                "blocks": self.blocks,
                "samples": self.samples,
                "running": self._thread is not None
                           and self._thread.is_alive(),
                "error": self.error,
            }

    # ---- lifecycle ----

    def start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="webui-engine")
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10.0)
        with self._audio_event:
            self._audio_event.notify_all()


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "sdrpp_tpu"

    # silence default stderr access log
    def log_message(self, fmt, *args):
        pass

    @property
    def engine(self) -> ReceiverEngine:
        return self.server.engine  # type: ignore[attr-defined]

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _bytes(self, body: bytes, ctype="application/octet-stream",
               headers=()):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in headers:
            self.send_header(k, str(v))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        url = urlparse(self.path)
        try:
            if url.path in ("/", "/index.html"):
                self._bytes(HTML_PAGE.encode(), "text/html; charset=utf-8")
            elif url.path == "/api/state":
                self._json(self.engine.snapshot())
            elif url.path == "/api/fft":
                self._get_fft()
            elif url.path == "/api/waterfall":
                self._get_waterfall(url)
            elif url.path == "/audio.wav":
                self._stream_audio()
            else:
                self._json({"error": "not found"}, 404)
        except (BrokenPipeError, ConnectionResetError):
            pass

    def _get_fft(self):
        line, hold, lines = self.engine.read_fft()
        body = line.astype("<f4").tobytes()
        hdrs = [("X-Lines", lines)]
        if hold is not None:
            body += hold.astype("<f4").tobytes()
            hdrs.append(("X-Hold", 1))
        self._bytes(body, headers=hdrs)

    def _get_waterfall(self, url):
        qs = parse_qs(url.query)
        since = int(qs.get("since", ["0"])[0])
        buf, counter = self.engine.read_waterfall_rows(since)
        self._bytes(buf.astype("<u4").tobytes(),
                    headers=[("X-Line", counter), ("X-Rows", len(buf)),
                             ("X-Width", self.engine.waterfall.data_width)])

    def _stream_audio(self):
        eng = self.engine
        rate = int(eng.audio_rate)
        # progressive WAV: RIFF/data sizes set to the 4 GB max so players
        # treat it as a live stream (the wavreader in the reference
        # tolerates broken sizes the same way, wavreader.h)
        hdr = b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, rate, rate * 4,
                                     4, 16)
        hdr += b"data" + struct.pack("<I", 0xFFFFFFFF)
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Cache-Control", "no-store")
        self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(hdr)
        cursor = max(0, eng._audio_written - rate // 4)
        while not eng._stop.is_set():
            frames, cursor = eng.read_audio(cursor)
            if len(frames):
                self.wfile.write(frames.astype("<i2").tobytes())
                self.wfile.flush()

    def do_POST(self):
        url = urlparse(self.path)
        if url.path != "/api/control":
            self._json({"error": "not found"}, 404)
            return
        try:
            n = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(n) or b"{}")
            self.engine.control(req["action"], req.get("value"))
            self._json({"ok": True})
        except (KeyError, ValueError, TypeError) as e:
            self._json({"error": str(e)}, 400)


class WebUIServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, engine: ReceiverEngine, addr="127.0.0.1", port=0):
        self.engine = engine
        super().__init__((addr, port), _Handler)


def serve_ui(engine: ReceiverEngine, addr="127.0.0.1", port=8080,
             forever=True):
    srv = WebUIServer(engine, addr, port)
    engine.start()
    log.info(f"web panadapter on http://{addr}:{srv.server_address[1]}/")
    if forever:
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            engine.stop()
            srv.server_close()
    return srv


HTML_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>sdrpp_tpu</title><style>
body{background:#101014;color:#ddd;font:13px system-ui,sans-serif;margin:0}
#bar{display:flex;gap:10px;align-items:center;padding:6px 10px;background:#18181e;flex-wrap:wrap}
#bar label{color:#9aa}
select,input,button{background:#24242c;color:#ddd;border:1px solid #444;border-radius:4px;padding:3px 6px}
button{cursor:pointer} canvas{display:block;width:100%}
#freq{font-size:18px;color:#7ec8ff;font-variant-numeric:tabular-nums}
#meter{color:#8f8}
</style></head><body>
<div id="bar">
 <span id="freq">--</span>
 <label>mode <select id="mode"></select></label>
 <label>BW <input id="bw" type="number" style="width:90px" step="1000"></label>
 <label>squelch <input id="sq" type="range" min="-100" max="0" value="-100" style="width:110px"></label>
 <label>vol <input id="vol" type="range" min="0" max="100" value="100" style="width:90px"></label>
 <button id="audio">&#9654; audio</button>
 <button id="auto">auto range</button>
 <label><input id="hold" type="checkbox"> hold</label>
 <span id="meter">SNR -- dB</span>
 <span id="err" style="color:#f66"></span>
</div>
<canvas id="spec" height="220"></canvas>
<canvas id="wf" height="512"></canvas>
<script>
const $=id=>document.getElementById(id);
let st=null, wfLine=0, wfImg=null;
async function getState(){st=await (await fetch('/api/state')).json();
 $('freq').textContent=((st.center_freq+st.offset)/1e6).toFixed(6)+' MHz';
 if(!$('mode').options.length) st.modes.forEach(m=>{const o=document.createElement('option');o.value=o.textContent=m;$('mode').append(o);});
 if(document.activeElement!==$('mode')) $('mode').value=st.mode;
 if(document.activeElement!==$('bw')) $('bw').value=st.bandwidth;
 $('meter').textContent='SNR '+st.vfo_snr.toFixed(1)+' dB  L '+st.vfo_level.toFixed(1)+' dBFS';
 $('err').textContent=st.error||'';}
async function ctl(action,value){await fetch('/api/control',{method:'POST',body:JSON.stringify({action,value})});getState();}
const spec=$('spec'),wf=$('wf');
function resize(){spec.width=wf.width=document.body.clientWidth;}
window.addEventListener('resize',resize);resize();
async function drawSpec(){if(!st)return;
 const r=await fetch('/api/fft'),buf=await r.arrayBuffer();
 const hold=r.headers.get('X-Hold');let a=new Float32Array(buf);
 let h=null; if(hold){h=a.subarray(a.length/2);a=a.subarray(0,a.length/2);}
 const g=spec.getContext('2d'),W=spec.width,H=spec.height;
 g.fillStyle='#0a0a10';g.fillRect(0,0,W,H);
 const lo=st.waterfall_min,hi=st.waterfall_max,y=v=>H-(Math.min(Math.max(v,lo),hi)-lo)/(hi-lo)*H;
 g.strokeStyle='#223';g.beginPath();for(let d=Math.ceil(lo/10)*10;d<hi;d+=10){g.moveTo(0,y(d));g.lineTo(W,y(d));}g.stroke();
 g.strokeStyle='#4af';g.beginPath();for(let i=0;i<a.length;i++){const x=i/a.length*W;i?g.lineTo(x,y(a[i])):g.moveTo(x,y(a[i]));}g.stroke();
 if(h){g.strokeStyle='#fa4';g.beginPath();for(let i=1;i<h.length;i++){const x=i/h.length*W;i>1?g.lineTo(x,y(h[i])):g.moveTo(x,y(h[i]));}g.stroke();}
 const vx=((st.offset-st.view_offset)/st.view_bandwidth+0.5)*W,vw=st.bandwidth/st.view_bandwidth*W;
 g.fillStyle='rgba(120,200,255,0.15)';g.fillRect(vx-vw/2,0,vw,H);
 g.strokeStyle='#7ec8ff';g.beginPath();g.moveTo(vx,0);g.lineTo(vx,H);g.stroke();}
async function drawWf(){if(!st)return;
 const r=await fetch('/api/waterfall?since='+wfLine),buf=await r.arrayBuffer();
 const rows=+r.headers.get('X-Rows'),width=+r.headers.get('X-Width');wfLine=+r.headers.get('X-Line');
 if(!rows)return;const g=wf.getContext('2d');
 if(!wfImg||wfImg.width!==width){wfImg=new ImageData(width,1);}
 g.drawImage(wf,0,0,wf.width,wf.height-rows,0,rows,wf.width,wf.height-rows);
 const px=new Uint8ClampedArray(buf);
 const tmp=document.createElement('canvas');tmp.width=width;tmp.height=rows;
 tmp.getContext('2d').putImageData(new ImageData(px,width,rows),0,0);
 g.drawImage(tmp,0,0,width,rows,0,0,wf.width,rows);}
spec.addEventListener('click',e=>{if(!st)return;
 const f=st.view_offset+(e.offsetX/spec.clientWidth-0.5)*st.view_bandwidth;
 ctl('set_offset',Math.round(f));});
wf.addEventListener('click',e=>{if(!st)return;
 const f=st.view_offset+(e.offsetX/wf.clientWidth-0.5)*st.view_bandwidth;
 ctl('set_offset',Math.round(f));});
$('mode').addEventListener('change',()=>ctl('set_mode',$('mode').value));
$('bw').addEventListener('change',()=>ctl('set_bandwidth',+$('bw').value));
$('sq').addEventListener('change',()=>ctl('set_squelch',+$('sq').value<=-100?null:+$('sq').value));
$('vol').addEventListener('input',()=>ctl('set_volume',+$('vol').value/100));
$('auto').addEventListener('click',()=>ctl('auto_range'));
$('hold').addEventListener('change',()=>ctl('set_fft_hold',$('hold').checked));
let player=null;
$('audio').addEventListener('click',()=>{if(player){player.pause();player=null;$('audio').textContent='\\u25b6 audio';}
 else{player=new Audio('/audio.wav?t='+Date.now());player.play();$('audio').textContent='\\u23f8 audio';}});
getState();setInterval(getState,1000);
setInterval(drawSpec,100);setInterval(drawWf,100);
</script></body></html>
"""
