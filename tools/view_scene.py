"""Interactive viewer for exported EKF debug scenes.

Closes the loop on the reference's ``ekf_viz`` 3D debug viewer workflow
(``/root/reference/src/ptudes/ins/viz_utils.py:317-626``): the repo
exports per-update-knot scenes as PLY + JSON
(``ptudes_tpu/viz/debug_scene.py``, written by
``ekf-bench ouster --save-debug-scene DIR``); this tool writes a
self-contained WebGL point-cloud viewer (no external JS dependencies —
the renderer is ~200 lines of inline WebGL2) into the scene directory and
serves it over HTTP.

Controls (same spirit as the reference's keyboard knot navigation,
``ins/viz_utils.py:530-618``):
    Left/Right arrows . step update knots
    1/2/3/4/5 ......... toggle source / target / map / cov-pos / cov-att
    drag / wheel ...... orbit / zoom;  double-click: recenter on EKF pose

Usage:
    python tools/view_scene.py SCENE_DIR [--port 8123] [--no-serve]
"""
import argparse
import functools
import http.server
import json
import os
import sys

HTML = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>ptudes-tpu scene viewer</title>
<style>
 body{margin:0;background:#101014;color:#ddd;font:13px monospace;overflow:hidden}
 #hud{position:absolute;left:10px;top:10px;white-space:pre;pointer-events:none}
 #help{position:absolute;right:10px;top:10px;text-align:right;color:#888}
 canvas{display:block}
</style></head><body>
<div id="hud"></div>
<div id="help">&larr;/&rarr; knots | 1:source 2:target 3:map 4:covP 5:covA<br>
drag orbit | wheel zoom | dblclick recenter</div>
<canvas id="c"></canvas>
<script>
"use strict";
const canvas = document.getElementById("c");
const gl = canvas.getContext("webgl2");
const hud = document.getElementById("hud");

// ---- minimal mat4 ----
function mat4mul(a,b){const o=new Float32Array(16);
 for(let i=0;i<4;i++)for(let j=0;j<4;j++){let s=0;
  for(let k=0;k<4;k++)s+=a[k*4+j]*b[i*4+k];o[i*4+j]=s;}return o;}
function persp(f,asp,n,fr){const t=1/Math.tan(f/2);const o=new Float32Array(16);
 o[0]=t/asp;o[5]=t;o[10]=(fr+n)/(n-fr);o[11]=-1;o[14]=2*fr*n/(n-fr);return o;}
function lookAtOrbit(tgt,az,el,r){
 const ce=Math.cos(el),se=Math.sin(el),ca=Math.cos(az),sa=Math.sin(az);
 const eye=[tgt[0]+r*ce*ca,tgt[1]+r*ce*sa,tgt[2]+r*se];
 const f=norm3(sub3(tgt,eye));const up=[0,0,1];
 const s=norm3(cross3(f,up));const u=cross3(s,f);
 return new Float32Array([s[0],u[0],-f[0],0, s[1],u[1],-f[1],0,
  s[2],u[2],-f[2],0, -dot3(s,eye),-dot3(u,eye),dot3(f,eye),1]);}
function sub3(a,b){return[a[0]-b[0],a[1]-b[1],a[2]-b[2]];}
function cross3(a,b){return[a[1]*b[2]-a[2]*b[1],a[2]*b[0]-a[0]*b[2],a[0]*b[1]-a[1]*b[0]];}
function dot3(a,b){return a[0]*b[0]+a[1]*b[1]+a[2]*b[2];}
function norm3(a){const l=Math.hypot(a[0],a[1],a[2])||1;return[a[0]/l,a[1]/l,a[2]/l];}

// ---- shaders ----
const vsrc=`#version 300 es
in vec3 pos; uniform mat4 mvp; uniform float psize;
void main(){gl_Position=mvp*vec4(pos,1.0);gl_PointSize=psize;}`;
const fsrc=`#version 300 es
precision mediump float; uniform vec4 color; out vec4 o;
void main(){o=color;}`;
function compile(type,src){const s=gl.createShader(type);gl.shaderSource(s,src);
 gl.compileShader(s);if(!gl.getShaderParameter(s,gl.COMPILE_STATUS))
 throw gl.getShaderInfoLog(s);return s;}
const prog=gl.createProgram();
gl.attachShader(prog,compile(gl.VERTEX_SHADER,vsrc));
gl.attachShader(prog,compile(gl.FRAGMENT_SHADER,fsrc));
gl.linkProgram(prog);gl.useProgram(prog);
const uMvp=gl.getUniformLocation(prog,"mvp");
const uColor=gl.getUniformLocation(prog,"color");
const uPsize=gl.getUniformLocation(prog,"psize");
const aPos=gl.getAttribLocation(prog,"pos");

// ---- binary PLY loader (save_ply format) ----
async function loadPly(url){
 const r=await fetch(url);if(!r.ok)return null;
 const buf=await r.arrayBuffer();const bytes=new Uint8Array(buf);
 let off=0,line="",n=0,props=0,inHdr=true;
 while(inHdr){let e=off;while(bytes[e]!==10)e++;
  line=new TextDecoder().decode(bytes.subarray(off,e));off=e+1;
  if(line.startsWith("element vertex"))n=parseInt(line.split(" ").pop());
  if(line.startsWith("property"))props++;
  if(line==="end_header")inHdr=false;}
 const dv=new DataView(buf,off);
 const out=new Float32Array(n*3);
 const stride=props>=6?15:12;     // xyz f32 (+ rgb u8)
 for(let i=0;i<n;i++){const b=i*stride;
  out[i*3]=dv.getFloat32(b,true);
  out[i*3+1]=dv.getFloat32(b+4,true);
  out[i*3+2]=dv.getFloat32(b+8,true);}
 return out;}
function makeBuf(data){const b=gl.createBuffer();
 gl.bindBuffer(gl.ARRAY_BUFFER,b);
 gl.bufferData(gl.ARRAY_BUFFER,data,gl.STATIC_DRAW);
 return {buf:b,n:data.length/3};}
function axesVerts(pose,s){ // pose: 16 row-major
 const o=[pose[3],pose[7],pose[11]];const v=[];
 for(let a=0;a<3;a++){v.push(o[0],o[1],o[2],
  o[0]+s*pose[a],o[1]+s*pose[4+a],o[2]+s*pose[8+a]);}
 return new Float32Array(v);}

// ---- scene state ----
let index=null,knots=[],ki=0;
const cache={};
const layers={source:true,target:true,map:true,cov_pos:false,cov_att:false};
const colors={source:[0.2,0.8,1,1],target:[1,0.5,0.15,1],map:[0.45,0.45,0.5,1],
 cov_pos:[1,0.2,0.6,0.5],cov_att:[0.9,0.9,0.2,0.6]};
let cam={tgt:[0,0,0],az:0.8,el:0.5,r:30};

async function loadKnot(i){
 const id=String(i).padStart(4,"0");
 if(cache[id])return cache[id];
 const meta=await (await fetch(`knot_${id}.json`)).json();
 const entry={meta:meta,bufs:{}};
 for(const name of ["source","target","cov_pos","cov_att","map"]){
  const d=await loadPly(`knot_${id}_${name}.ply`);
  if(d)entry.bufs[name]=makeBuf(d);}
 // map may only exist at map_stride knots: fall back to latest earlier one
 if(!entry.bufs.map){
  for(let k=knots.indexOf(i);k>=0;k--){
   const id2=String(knots[k]).padStart(4,"0");
   if(cache[id2]&&cache[id2].bufs.map&&cache[id2].ownMap){
    entry.bufs.map=cache[id2].bufs.map;break;}
   const d=await loadPly(`knot_${id2}_map.ply`);
   if(d){entry.bufs.map=makeBuf(d);break;}}}
 else entry.ownMap=true;
 entry.axes=makeBuf(axesVerts(meta.ekf_pose.flat?meta.ekf_pose.flat():
   [].concat(...meta.ekf_pose),2.0));
 cache[id]=entry;return entry;}

function draw(entry){
 const w=canvas.clientWidth,h=canvas.clientHeight;
 if(canvas.width!==w||canvas.height!==h){canvas.width=w;canvas.height=h;}
 gl.viewport(0,0,w,h);
 gl.clearColor(0.06,0.06,0.08,1);gl.clear(gl.COLOR_BUFFER_BIT);
 gl.enable(gl.BLEND);gl.blendFunc(gl.SRC_ALPHA,gl.ONE_MINUS_SRC_ALPHA);
 const mvp=mat4mul(persp(0.9,w/h,0.1,2000),
   lookAtOrbit(cam.tgt,cam.az,cam.el,cam.r));
 gl.uniformMatrix4fv(uMvp,false,mvp);
 for(const name of Object.keys(layers)){
  if(!layers[name]||!entry.bufs[name])continue;
  const b=entry.bufs[name];
  gl.bindBuffer(gl.ARRAY_BUFFER,b.buf);
  gl.enableVertexAttribArray(aPos);
  gl.vertexAttribPointer(aPos,3,gl.FLOAT,false,0,0);
  gl.uniform4fv(uColor,colors[name]);
  gl.uniform1f(uPsize,name==="map"?1.5:2.5);
  gl.drawArrays(gl.POINTS,0,b.n);}
 // EKF pose axes as 3 lines
 gl.bindBuffer(gl.ARRAY_BUFFER,entry.axes.buf);
 gl.vertexAttribPointer(aPos,3,gl.FLOAT,false,0,0);
 const axc=[[1,0.3,0.3,1],[0.3,1,0.3,1],[0.3,0.5,1,1]];
 for(let a=0;a<3;a++){gl.uniform4fv(uColor,axc[a]);
  gl.drawArrays(gl.LINES,a*2,2);}
 const m=entry.meta;
 hud.textContent=`knot ${m.knot}/${knots[knots.length-1]}  `+
  `sigma=${m.sigma.toFixed(3)}  iters=${m.iterations}  `+
  `corr=${m.num_corr}  valid=${m.scan_valid}\n`+
  `pos=[${m.ekf_pose[0][3].toFixed(2)}, ${m.ekf_pose[1][3].toFixed(2)}, `+
  `${m.ekf_pose[2][3].toFixed(2)}]\n`+
  `layers: ${Object.keys(layers).filter(k=>layers[k]).join(" ")}`;}

let current=null;
async function show(i){
 ki=Math.max(0,Math.min(knots.length-1,i));
 current=await loadKnot(knots[ki]);
 draw(current);}

window.addEventListener("keydown",async e=>{
 if(e.key==="ArrowRight")await show(ki+1);
 else if(e.key==="ArrowLeft")await show(ki-1);
 else{const m={"1":"source","2":"target","3":"map","4":"cov_pos","5":"cov_att"}[e.key];
  if(m){layers[m]=!layers[m];if(current)draw(current);}}});
let dragging=false,lx=0,ly=0;
canvas.addEventListener("mousedown",e=>{dragging=true;lx=e.clientX;ly=e.clientY;});
window.addEventListener("mouseup",()=>dragging=false);
window.addEventListener("mousemove",e=>{if(!dragging)return;
 cam.az-=(e.clientX-lx)*0.008;cam.el+=(e.clientY-ly)*0.008;
 cam.el=Math.max(-1.5,Math.min(1.5,cam.el));
 lx=e.clientX;ly=e.clientY;if(current)draw(current);});
canvas.addEventListener("wheel",e=>{cam.r*=Math.exp(e.deltaY*0.001);
 if(current)draw(current);e.preventDefault();});
canvas.addEventListener("dblclick",()=>{if(!current)return;
 const p=current.meta.ekf_pose;cam.tgt=[p[0][3],p[1][3],p[2][3]];
 draw(current);});
window.addEventListener("resize",()=>{if(current)draw(current);});

(async()=>{
 index=await (await fetch("scene.json")).json();
 knots=index.knots;
 await show(0);
 if(current){const p=current.meta.ekf_pose;
  cam.tgt=[p[0][3],p[1][3],p[2][3]];draw(current);}
})();
</script></body></html>
"""


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scene_dir")
    ap.add_argument("--port", type=int, default=8123)
    ap.add_argument("--no-serve", action="store_true",
                    help="only write viewer.html, don't start the server")
    args = ap.parse_args()

    idx = os.path.join(args.scene_dir, "scene.json")
    if not os.path.exists(idx):
        sys.exit(f"{idx} not found — export scenes first with "
                 "`ptudes-tpu ekf-bench ouster ... --save-debug-scene DIR`")
    with open(idx) as f:
        knots = json.load(f)["knots"]
    out = os.path.join(args.scene_dir, "viewer.html")
    with open(out, "w") as f:
        f.write(HTML)
    print(f"viewer written: {out} ({len(knots)} knots)")
    if args.no_serve:
        return
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=args.scene_dir)
    print(f"serving http://localhost:{args.port}/viewer.html  (Ctrl-C stops)")
    http.server.HTTPServer(("127.0.0.1", args.port), handler).serve_forever()


if __name__ == "__main__":
    main()
