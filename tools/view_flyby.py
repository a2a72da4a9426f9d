"""Interactive player for exported flyby maps + camera programs.

Closes the loop on the reference's cinematic map flyby
(``/root/reference/src/ptudes/cli/flyby.py`` driving an OpenGL PointViz
camera through BUILDING -> TO_THE_BEGINNING -> COURSING -> TO_THE_APEX):
the repo's ``ptudes-tpu flyby`` exports the registered map as PLY and the
camera state machine's program as JSON keyframes
(``ptudes_tpu/viz/fly.py``); this tool writes a self-contained WebGL
player (inline WebGL2, no external JS) next to them and serves it.

Camera model matches PointViz orbit conventions: each keyframe carries a
target pose (4x4), pitch/yaw in degrees, and a log-scale dolly where
distance = 50 * exp(dolly / 100) (see ``viz/fly.py estimate_apex_dolly``
and reference ``src/ptudes/utils.py:107-111``).

Controls:
    space ........ play / pause
    left/right ... scrub -/+ 2 s
    up/down ...... playback rate x2 / /2
    drag / wheel . manual orbit offset / zoom bias (resets on play)

Usage:
    python tools/view_flyby.py MAP_PLY CAMERA_JSON [--port 8124]
                               [--no-serve]
"""
import argparse
import functools
import http.server
import json
import os
import shutil
import sys

HTML = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>ptudes-tpu flyby</title>
<style>
 body{margin:0;background:#101014;color:#ddd;font:13px monospace;overflow:hidden}
 #hud{position:absolute;left:10px;top:10px;white-space:pre;pointer-events:none}
 #help{position:absolute;right:10px;top:10px;text-align:right;color:#888}
 canvas{display:block}
</style></head><body>
<div id="hud"></div>
<div id="help">space play/pause | &larr;/&rarr; scrub | &uarr;/&darr; rate<br>
drag orbit bias | wheel zoom bias</div>
<canvas id="c"></canvas>
<script>
"use strict";
const canvas=document.getElementById("c");
const gl=canvas.getContext("webgl2");
const hud=document.getElementById("hud");
function mat4mul(a,b){const o=new Float32Array(16);
 for(let i=0;i<4;i++)for(let j=0;j<4;j++){let s=0;
  for(let k=0;k<4;k++)s+=a[k*4+j]*b[i*4+k];o[i*4+j]=s;}return o;}
function persp(f,asp,n,fr){const t=1/Math.tan(f/2);const o=new Float32Array(16);
 o[0]=t/asp;o[5]=t;o[10]=(fr+n)/(n-fr);o[11]=-1;o[14]=2*fr*n/(n-fr);return o;}
function sub3(a,b){return[a[0]-b[0],a[1]-b[1],a[2]-b[2]];}
function cross3(a,b){return[a[1]*b[2]-a[2]*b[1],a[2]*b[0]-a[0]*b[2],a[0]*b[1]-a[1]*b[0]];}
function dot3(a,b){return a[0]*b[0]+a[1]*b[1]+a[2]*b[2];}
function norm3(a){const l=Math.hypot(a[0],a[1],a[2])||1;return[a[0]/l,a[1]/l,a[2]/l];}
function lookAtOrbit(tgt,az,el,r){
 const ce=Math.cos(el),se=Math.sin(el),ca=Math.cos(az),sa=Math.sin(az);
 const eye=[tgt[0]+r*ce*ca,tgt[1]+r*ce*sa,tgt[2]+r*se];
 const f=norm3(sub3(tgt,eye));const up=[0,0,1];
 const s=norm3(cross3(f,up));const u=cross3(s,f);
 return new Float32Array([s[0],u[0],-f[0],0, s[1],u[1],-f[1],0,
  s[2],u[2],-f[2],0, -dot3(s,eye),-dot3(u,eye),dot3(f,eye),1]);}
const vsrc=`#version 300 es
in vec3 pos; uniform mat4 mvp;
out float d;
void main(){gl_Position=mvp*vec4(pos,1.0);gl_PointSize=1.6;
 d=clamp(pos.z*0.08+0.55,0.25,1.0);}`;
const fsrc=`#version 300 es
precision mediump float; in float d; out vec4 o;
void main(){o=vec4(d*0.75,d*0.8,d*0.9,1.0);}`;
function compile(t,s){const sh=gl.createShader(t);gl.shaderSource(sh,s);
 gl.compileShader(sh);if(!gl.getShaderParameter(sh,gl.COMPILE_STATUS))
 throw gl.getShaderInfoLog(sh);return sh;}
const prog=gl.createProgram();
gl.attachShader(prog,compile(gl.VERTEX_SHADER,vsrc));
gl.attachShader(prog,compile(gl.FRAGMENT_SHADER,fsrc));
gl.linkProgram(prog);gl.useProgram(prog);
const uMvp=gl.getUniformLocation(prog,"mvp");
const aPos=gl.getAttribLocation(prog,"pos");
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
 const stride=props>=6?15:12;
 for(let i=0;i<n;i++){const b=i*stride;
  out[i*3]=dv.getFloat32(b,true);
  out[i*3+1]=dv.getFloat32(b+4,true);
  out[i*3+2]=dv.getFloat32(b+8,true);}
 return out;}

let mapBuf=null,mapN=0,prog_keys=null,dur=0;
let t=0,playing=true,rate=1.0,last=null;
let biasAz=0,biasEl=0,biasZoom=1;
function keyAt(tt){
 if(tt<=prog_keys[0].t)return prog_keys[0];
 const last=prog_keys[prog_keys.length-1];
 if(tt>=last.t)return last;
 let lo=0,hi=prog_keys.length-1;
 while(hi-lo>1){const m=(lo+hi)>>1;
  if(prog_keys[m].t<=tt)lo=m;else hi=m;}
 const a=prog_keys[lo],b=prog_keys[hi];
 const f=(tt-a.t)/Math.max(1e-9,b.t-a.t);
 const lerp=(x,y)=>x+(y-x)*f;
 // yaw can wrap: take the short way around
 let dy=b.yaw-a.yaw; if(dy>180)dy-=360; if(dy<-180)dy+=360;
 return {t:tt,
  target:[[0,0,0,lerp(a.target[0][3],b.target[0][3])],
          [0,0,0,lerp(a.target[1][3],b.target[1][3])],
          [0,0,0,lerp(a.target[2][3],b.target[2][3])]],
  pitch:lerp(a.pitch,b.pitch),yaw:a.yaw+dy*f,
  dolly:lerp(a.dolly,b.dolly)};}
function draw(){
 const w=canvas.clientWidth,h=canvas.clientHeight;
 if(canvas.width!==w||canvas.height!==h){canvas.width=w;canvas.height=h;}
 gl.viewport(0,0,w,h);
 gl.clearColor(0.06,0.06,0.08,1);gl.clear(gl.COLOR_BUFFER_BIT);
 const k=keyAt(t);
 const tgt=[k.target[0][3],k.target[1][3],k.target[2][3]];
 const az=k.yaw*Math.PI/180+biasAz;
 const el=Math.max(-1.5,Math.min(1.5,-k.pitch*Math.PI/180+biasEl));
 const r=50*Math.exp(k.dolly/100)*biasZoom;
 const mvp=mat4mul(persp(0.9,w/h,0.1,4000),lookAtOrbit(tgt,az,el,r));
 gl.uniformMatrix4fv(uMvp,false,mvp);
 gl.bindBuffer(gl.ARRAY_BUFFER,mapBuf);
 gl.enableVertexAttribArray(aPos);
 gl.vertexAttribPointer(aPos,3,gl.FLOAT,false,0,0);
 gl.drawArrays(gl.POINTS,0,mapN);
 hud.textContent=`t ${t.toFixed(1)} / ${dur.toFixed(1)} s  `+
  `${playing?"playing":"paused"}  rate x${rate}\n`+
  `pts ${mapN}  dolly ${k.dolly.toFixed(0)}  `+
  `pitch ${k.pitch.toFixed(0)}  yaw ${k.yaw.toFixed(0)}`;}
function tick(now){
 if(last!==null&&playing){t+=(now-last)/1000*rate;
  if(t>dur)t=0;}
 last=now;draw();requestAnimationFrame(tick);}
window.addEventListener("keydown",e=>{
 if(e.key===" "){playing=!playing;if(playing){biasAz=0;biasEl=0;biasZoom=1;}}
 else if(e.key==="ArrowRight")t=Math.min(dur,t+2);
 else if(e.key==="ArrowLeft")t=Math.max(0,t-2);
 else if(e.key==="ArrowUp")rate=Math.min(16,rate*2);
 else if(e.key==="ArrowDown")rate=Math.max(0.125,rate/2);
 else return; e.preventDefault();});
let dragging=false,lx=0,ly=0;
canvas.addEventListener("mousedown",e=>{dragging=true;lx=e.clientX;ly=e.clientY;});
window.addEventListener("mouseup",()=>dragging=false);
window.addEventListener("mousemove",e=>{if(!dragging)return;
 biasAz-=(e.clientX-lx)*0.008;biasEl+=(e.clientY-ly)*0.008;
 lx=e.clientX;ly=e.clientY;});
canvas.addEventListener("wheel",e=>{biasZoom*=Math.exp(e.deltaY*0.001);
 e.preventDefault();});
(async()=>{
 prog_keys=await (await fetch("camera.json")).json();
 dur=prog_keys[prog_keys.length-1].t;
 const pts=await loadPly("map.ply");
 const b=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,b);
 gl.bufferData(gl.ARRAY_BUFFER,pts,gl.STATIC_DRAW);
 mapBuf=b;mapN=pts.length/3;
 requestAnimationFrame(tick);
})();
</script></body></html>
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("map_ply")
    ap.add_argument("camera_json")
    ap.add_argument("--port", type=int, default=8124)
    ap.add_argument("--no-serve", action="store_true")
    args = ap.parse_args()

    if not os.path.isfile(args.map_ply):
        print(f"no such map PLY: {args.map_ply}", file=sys.stderr)
        return 1
    if not os.path.isfile(args.camera_json):
        print(f"no such camera program: {args.camera_json}",
              file=sys.stderr)
        return 1
    with open(args.camera_json) as f:
        prog = json.load(f)
    if not prog or "target" not in prog[0]:
        print("camera json is not a flyby program (expected a list of "
              "{t, target, pitch, yaw, dolly})", file=sys.stderr)
        return 1

    d = os.path.dirname(os.path.abspath(args.map_ply))
    # the player fetches fixed names next to viewer_flyby.html
    if os.path.abspath(args.map_ply) != os.path.join(d, "map.ply"):
        shutil.copyfile(args.map_ply, os.path.join(d, "map.ply"))
    if os.path.abspath(args.camera_json) != os.path.join(d, "camera.json"):
        shutil.copyfile(args.camera_json, os.path.join(d, "camera.json"))
    out = os.path.join(d, "viewer_flyby.html")
    with open(out, "w") as f:
        f.write(HTML)
    print(f"player -> {out}")
    print(f"{len(prog)} keyframes, {prog[-1]['t']:.1f} s")

    if args.no_serve:
        return 0
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=d)
    with http.server.ThreadingHTTPServer(("127.0.0.1", args.port),
                                         handler) as srv:
        print(f"serving http://127.0.0.1:{args.port}/viewer_flyby.html "
              "(ctrl-c to stop)")
        srv.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
