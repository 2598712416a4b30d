import time, jax, jax.numpy as jnp
from __graft_entry__ import _cornell
from craytracer_tpu.camera import generate_rays
from craytracer_tpu.sampling import uniforms
from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE, trace_paths

size=512; scene,camera,film=_cornell(size,size)
n0=film.num_pixels
ITER=8

def bench_n(mult):
    pix=jnp.tile(jnp.arange(n0,dtype=jnp.int32),mult)
    spp_lane=jnp.repeat(jnp.arange(mult,dtype=jnp.int32),n0)
    def f(s0):
        def body(s,c):
            acc,tot=c
            jit=uniforms(0,pix,s0+s,CAMERA_BOUNCE,2,0)
            o,d=generate_rays(camera,film,pix,jit)
            L,good,m=trace_paths(scene,o,d,0,pix,s0+s,5,with_metrics=True)
            return acc+L.mean(),tot+m["rays"]+m["shadow_rays"]
        return jax.lax.fori_loop(0,ITER,body,(jnp.zeros(()),jnp.zeros((),jnp.int32)))
    g=jax.jit(f)
    a,r=g(1); float(a)
    best=1e9
    for rep in range(3):
        t0=time.time(); a,r=g(100+rep*ITER*7); float(a)
        best=min(best,time.time()-t0)
    rays=int(r)
    print(f"mult={mult} N={n0*mult}: {best:.3f}s  {rays/best/1e6:.1f}M rays/s")

bench_n(1)
bench_n(2)
bench_n(4)
