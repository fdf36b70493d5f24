"""Browser HTTP server (stdlib) — the serve entry point.

Equivalent of `panagram view` (reference view.py:22 + __main__.py:14-56):
three tabs, coordinate navigation (genome -> chromosome -> region with
pan/zoom), bookmarks, and a JSON/bitdump API, rendered server-side with
matplotlib and served by ThreadingHTTPServer.
"""

from __future__ import annotations

import json
import threading
import traceback
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from ..index import Index
from . import plots

_PAGE = """<!DOCTYPE html>
<html><head><title>panagram_tpu</title><style>
body{font-family:sans-serif;margin:0;background:#f4f5f7}
header{background:#1f3044;color:#fff;padding:10px 16px;font-size:18px}
nav button{margin:8px 4px;padding:6px 14px;border:1px solid #1f3044;
  background:#fff;cursor:pointer;border-radius:4px}
nav button.active{background:#1f3044;color:#fff}
.tab{display:none;padding:12px 16px}
.tab.active{display:block}
img{max-width:100%;background:#fff;border:1px solid #ddd;margin:6px 0}
select,input{margin:2px;padding:3px}
.ctl{background:#fff;padding:8px;border:1px solid #ddd;border-radius:4px}
</style></head><body>
<header>panagram_tpu &mdash; pan-genome k-mer browser</header>
<nav>
 <button id="b0" onclick="tab(0)" class="active">Pangenome</button>
 <button id="b1" onclick="tab(1)">Anchor genome</button>
 <button id="b2" onclick="tab(2)">Chromosome</button>
</nav>
<div id="t0" class="tab active">
 <img src="/plot/pangenome/composition.png">
 <img src="/plot/pangenome/dendrogram.png">
 <img src="/plot/pangenome/sizes.png">
 <img src="/plot/pangenome/chr_hist.png">
</div>
<div id="t1" class="tab">
 <div class="ctl">Anchor genome:
  <select id="genome" onchange="refreshAnchor()"></select></div>
 <img id="wg">
 <img id="umap">
 <img id="genec">
</div>
<div id="t2" class="tab">
 <div class="ctl">
  Genome <select id="cgenome" onchange="chromList()"></select>
  Chromosome <select id="chrom" onchange="setRegion(null,null)"></select>
  <input id="start" size="10" placeholder="start">
  <input id="end" size="10" placeholder="end">
  <button onclick="go()">Go</button>
  <button onclick="zoom(0.5)">Zoom in</button>
  <button onclick="zoom(2)">Zoom out</button>
  <button onclick="pan(-0.5)">&laquo; Pan</button>
  <button onclick="pan(0.5)">Pan &raquo;</button>
  <select id="bookmarks" onchange="jumpBookmark()" style="display:none"></select>
 </div>
 <img id="chrwhole">
 <img id="chrview">
 <img id="chrumap">
</div>
<script>
let META=null;
function tab(i){for(let j=0;j<3;j++){
  document.getElementById('t'+j).classList.toggle('active',i==j);
  document.getElementById('b'+j).classList.toggle('active',i==j);}}
async function init(){
  META=await (await fetch('/api/meta')).json();
  for(const sel of ['genome','cgenome']){
    const s=document.getElementById(sel);
    for(const g of META.anchors){const o=document.createElement('option');
      o.value=o.text=g;s.add(o);}
  }
  if(META.init.genome){document.getElementById('genome').value=META.init.genome;
    document.getElementById('cgenome').value=META.init.genome;}
  if(META.bookmarks.length){const s=document.getElementById('bookmarks');
    s.style.display='';
    const o=document.createElement('option');o.text='bookmarks...';s.add(o);
    for(const b of META.bookmarks){const o=document.createElement('option');
      o.value=JSON.stringify(b);o.text=b.name||(b.chrom+':'+b.start+'-'+b.end);
      s.add(o);}}
  refreshAnchor(); chromList();
  if(META.init.chrom){document.getElementById('chrom').value=META.init.chrom;
    setRegion(META.init.start,META.init.end); tab(2);}
}
function refreshAnchor(){
  const g=document.getElementById('genome').value;
  document.getElementById('wg').src='/plot/anchor/'+g+'/whole.png';
  document.getElementById('umap').src='/plot/anchor/'+g+'/umap.png';
  document.getElementById('genec').src='/plot/anchor/'+g+'/genes.png';
}
function chromList(){
  const g=document.getElementById('cgenome').value;
  const s=document.getElementById('chrom');s.innerHTML='';
  for(const c of META.chrs[g]){const o=document.createElement('option');
    o.value=o.text=c;s.add(o);}
  setRegion(null,null);
}
function region(){
  const size=META.sizes[document.getElementById('cgenome').value]
    [document.getElementById('chrom').value];
  let st=parseInt(document.getElementById('start').value);
  let en=parseInt(document.getElementById('end').value);
  if(isNaN(st)||st<0)st=0; if(isNaN(en)||en>size||en<=st)en=size;
  return [st,en,size];
}
function setRegion(st,en){
  document.getElementById('start').value=st==null?'':st;
  document.getElementById('end').value=en==null?'':en;
  go();
}
function go(){
  const g=document.getElementById('cgenome').value;
  const c=document.getElementById('chrom').value;
  const [st,en,_]=region();
  document.getElementById('chrwhole').src='/plot/chrom/'+g+'/'+c+'/whole.png';
  document.getElementById('chrview').src=
    '/plot/chrom/'+g+'/'+c+'/view.png?start='+st+'&end='+en;
  document.getElementById('chrumap').src='/plot/chrom/'+g+'/'+c+'/umap.png';
}
function zoom(f){const [st,en,size]=region();const c=(st+en)/2,h=(en-st)*f/2;
  setRegion(Math.max(0,Math.round(c-h)),Math.min(size,Math.round(c+h)));}
function pan(f){const [st,en,size]=region();let d=Math.round((en-st)*f);
  if(st+d<0)d=-st; if(en+d>size)d=size-en;
  setRegion(st+d,en+d);}
function jumpBookmark(){const v=document.getElementById('bookmarks').value;
  try{const b=JSON.parse(v);document.getElementById('chrom').value=b.chrom;
    setRegion(b.start,b.end);}catch(e){}}
init();
</script></body></html>
"""


class _Handler(BaseHTTPRequestHandler):
    index: Index = None
    params = None
    # bounded LRU so a long-lived session cannot accumulate every rendered
    # PNG; reset by serve() so a new/rebuilt index never serves stale plots
    _cache = OrderedDict()
    _cache_max = 128
    _lock = threading.Lock()

    def log_message(self, fmt, *args):
        pass

    def _send(self, body, ctype="text/html"):
        if isinstance(body, str):
            body = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, msg, code=500):
        body = msg.encode()
        self.send_response(code)
        self.send_header("Content-Type", "text/plain")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        parts = [p for p in url.path.split("/") if p]
        try:
            self._route(url.path, parts, q)
        except BrokenPipeError:
            pass
        except Exception:
            self._error(traceback.format_exc())

    def _cached_png(self, key, build):
        with self._lock:
            if key in self._cache:
                self._cache.move_to_end(key)
                return self._cache[key]
        png = build()
        with self._lock:
            self._cache[key] = png
            self._cache.move_to_end(key)
            while len(self._cache) > self._cache_max:
                self._cache.popitem(last=False)
        return png

    def _route(self, path, parts, q):
        idx = self.index
        if not parts:
            return self._send(_PAGE)

        if parts[0] == "api":
            if parts[1] == "meta":
                meta = {
                    "genomes": list(idx.genome_names),
                    "anchors": [g for g in idx.anchor_genomes
                                if idx.genomes[g].chrs is not None],
                    "chrs": {g: list(idx.genomes[g].chrs.index)
                             for g in idx.anchor_genomes
                             if idx.genomes[g].chrs is not None},
                    "sizes": {g: {c: int(s) for c, s in
                                  idx.genomes[g].sizes.items()}
                              for g in idx.anchor_genomes
                              if idx.genomes[g].chrs is not None},
                    "ngenomes": idx.ngenomes,
                    "init": self.params.get("init", {}),
                    "bookmarks": self.params.get("bookmarks", []),
                }
                return self._send(json.dumps(meta), "application/json")
            if parts[1] == "bitdump":
                df = idx.query_bitmap(
                    q["genome"], q["chrom"], int(q.get("start", 0)),
                    int(q["end"]), int(q.get("step", 1)),
                )
                return self._send(df.to_csv(sep="\t"), "text/plain")

        if parts[0] == "plot":
            png = None
            if parts[1] == "pangenome":
                builders = {
                    "composition.png": lambda: plots.pangenome_composition(idx),
                    "dendrogram.png": lambda: plots.genome_dendrogram(idx),
                    "sizes.png": lambda: plots.genome_sizes_plot(idx),
                    "chr_hist.png": lambda: plots.chromosome_histograms(idx),
                }
                png = self._cached_png(parts[2], builders[parts[2]])
            elif parts[1] == "anchor":
                genome, what = parts[2], parts[3]
                builders = {
                    "whole.png": lambda: plots.whole_genome_plot(
                        idx, genome, self.params.get("max_chr_bins", 350)),
                    "umap.png": lambda: plots.umap_scatter(idx, genome),
                    "genes.png": lambda: plots.gene_content_plot(idx, genome),
                }
                png = self._cached_png(f"{genome}/{what}", builders[what])
            elif parts[1] == "chrom":
                genome, chrom, what = parts[2], parts[3], parts[4]
                if what == "whole.png":
                    png = self._cached_png(
                        f"{genome}/{chrom}/whole",
                        lambda: plots.chr_whole_plot(idx, genome, chrom),
                    )
                elif what == "umap.png":
                    png = self._cached_png(
                        f"{genome}/{chrom}/umap",
                        lambda: plots.umap_scatter(idx, genome, chrom),
                    )
                else:
                    start = int(q["start"]) if q.get("start") else None
                    end = int(q["end"]) if q.get("end") else None
                    png = plots.chromosome_view(
                        idx, genome, chrom, start, end,
                        self.params.get("max_chr_bins", 350),
                        order_names=self.params.get("order"),
                    )
            if png is not None:
                return self._send(png, "image/png")

        self._error("not found", 404)


def _load_bookmarks(path):
    if not path:
        return []
    out = []
    with open(path) as f:
        for line in f:
            p = line.split("\t")
            if len(p) >= 3:
                out.append({
                    "chrom": p[0], "start": int(p[1]), "end": int(p[2]),
                    "name": p[3].strip() if len(p) > 3 else None,
                })
    return out


def serve(args):
    index = Index(args.index_dir)
    _Handler.index = index
    _Handler._cache = OrderedDict()
    _Handler.params = {
        "max_chr_bins": getattr(args, "max_chr_bins", 350),
        "order": getattr(args, "order", None),
        "init": {
            "genome": getattr(args, "genome", None),
            "chrom": getattr(args, "chrom", None),
            "start": getattr(args, "start", None),
            "end": getattr(args, "end", None),
        },
        "bookmarks": _load_bookmarks(getattr(args, "bookmarks", None)),
    }
    host = getattr(args, "host", "127.0.0.1")
    port = int(getattr(args, "port", 8050))
    httpd = ThreadingHTTPServer((host, port), _Handler)
    print(f"panagram_tpu view serving http://{host}:{port}/")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        index.close()
