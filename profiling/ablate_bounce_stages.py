import time, jax, jax.numpy as jnp
from __graft_entry__ import _cornell
from craytracer_tpu.camera import generate_rays
from craytracer_tpu.sampling import uniforms
from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE
from craytracer_tpu.ops import intersect_scene, shadow_distance
from craytracer_tpu.bsdf import gather_params, bsdf_f_direct, bsdf_sample
from craytracer_tpu.lights import sample_one_light
from craytracer_tpu.core import math as vm

size=512; scene,camera,film=_cornell(size,size)
n=film.num_pixels; pix=jnp.arange(n,dtype=jnp.int32)
ITER=96

def timeit(name, fn, *args):
    f=jax.jit(fn)
    r=f(*args); float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    best=1e9
    for rep in range(3):
        t0=time.time()
        r=f(*args)
        float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
        best=min(best,time.time()-t0)
    print(f"{name}: {best*1e3:.1f} ms total, {best/ITER*1e3:.3f} ms/iter")
    return best

jit0=uniforms(0,pix,0,CAMERA_BOUNCE,2,0)
o,d=generate_rays(camera,film,pix,jit0)

# 1. intersect only, looped
def f_intersect(o,d,s0):
    def body(i,c):
        acc,o2,d2=c
        h=intersect_scene(scene,o2,d2)
        # dynamic feedback so nothing hoists
        nd=vm.normalize(d2+0.0001*h.normal)
        return acc+h.t.sum(), o2, nd
    a,_,_=jax.lax.fori_loop(0,ITER,body,(jnp.zeros(()),o,d))
    return a
timeit("intersect", f_intersect, o,d,0)

# 2. shadow only
def f_shadow(o,d,s0):
    def body(i,c):
        acc,o2,d2=c
        t=shadow_distance(scene,o2,d2,jnp.full((n,),100.0))
        nd=vm.normalize(d2+0.0001*jnp.stack([t,t,t],-1))
        return acc+t.sum(),o2,nd
    a,_,_=jax.lax.fori_loop(0,ITER,body,(jnp.zeros(()),o,d))
    return a
timeit("shadow", f_shadow, o,d,0)

# 3. gather_params + bsdf_sample + NEE-eval (no intersect/shadow)
def f_shade(o,d,s0):
    h=intersect_scene(scene,o,d)
    def body(i,c):
        acc,wo=c
        mp=gather_params(scene.materials,scene.textures,h.mat_id,h.uv)
        u=uniforms(0,pix,i+s0,0,9,0)
        ft,fb,fn=vm.make_shading_frame(h.normal,h.dpdu)
        ls=sample_one_light(scene,u[:,4],u[:,0:2],h.point,fn,ft,fb)
        f_nee=bsdf_f_direct(ls.wi,wo,mp)*jnp.abs(vm.dot(fn,ls.wi))[:,None]
        wol=vm.to_local(wo,ft,fb,fn)
        fs,wil,pdf,sp,gl=bsdf_sample(u[:,5:8],wol,mp)
        nwo=vm.normalize(wo+0.0001*vm.to_world(wil,ft,fb,fn))
        return acc+f_nee.sum()+fs.sum()+pdf.sum(), nwo
    a,_=jax.lax.fori_loop(0,ITER,body,(jnp.zeros(()),-d))
    return a
timeit("shade(gather+NEE-eval+sample)", f_shade, o,d,0)

# 4. RNG only
def f_rng(o,d,s0):
    def body(i,c):
        u=uniforms(0,pix,i+s0,0,9,0)
        return c+u.sum()
    return jax.lax.fori_loop(0,ITER,body,jnp.zeros(()))
timeit("rng9", f_rng, o,d,0)
