import time, jax, jax.numpy as jnp
from __graft_entry__ import _cornell
from craytracer_tpu.camera import generate_rays
from craytracer_tpu.sampling import uniforms
from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE
from craytracer_tpu.ops import intersect_scene
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
        t0=time.time(); r=f(*args)
        float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
        best=min(best,time.time()-t0)
    print(f"{name}: {best/ITER*1e3:.3f} ms/iter")
    return best

jit0=uniforms(0,pix,0,CAMERA_BOUNCE,2,0)
o,d=generate_rays(camera,film,pix,jit0)
h=intersect_scene(scene,o,d)
ft,fb,fn=vm.make_shading_frame(h.normal,h.dpdu)
mp0=gather_params(scene.materials,scene.textures,h.mat_id,h.uv)

def loop(body):
    def g(o,d,s0):
        def b(i,c):
            return body(i,c,s0)
        a,_=jax.lax.fori_loop(0,ITER,b,(jnp.zeros(()),-d))
        return a
    return g

# gather only (dynamic mat_id so not hoisted)
def f_gather(i,c,s0):
    acc,wo=c
    mid=(h.mat_id+i)% scene.materials.color.shape[0]
    mp=gather_params(scene.materials,scene.textures,mid,h.uv)
    return acc+mp.color.sum()+mp.intensity.sum(), wo
timeit("gather_params", loop(f_gather), o,d,0)

# sample_one_light only
def f_light(i,c,s0):
    acc,wo=c
    u=uniforms(0,pix,i+s0,0,9,0)
    ls=sample_one_light(scene,u[:,4],u[:,0:2],h.point,fn,ft,fb)
    return acc+ls.wi.sum()+ls.pdf.sum()+ls.li.sum()+ls.distance.sum(), wo
timeit("sample_one_light", loop(f_light), o,d,0)

# bsdf_f_direct only
def f_nee_eval(i,c,s0):
    acc,wo=c
    u=uniforms(0,pix,i+s0,0,2,0)
    wi=vm.normalize(wo+0.1*jnp.stack([u[:,0],u[:,1],u[:,0]*u[:,1]],-1))
    f=bsdf_f_direct(wi,wo,mp0)
    return acc+f.sum(), wo
timeit("bsdf_f_direct", loop(f_nee_eval), o,d,0)

# bsdf_sample only
def f_sample(i,c,s0):
    acc,wo=c
    u=uniforms(0,pix,i+s0,0,3,0)
    wol=vm.to_local(wo,ft,fb,fn)
    fs,wil,pdf,sp,gl=bsdf_sample(u,wol,mp0)
    return acc+fs.sum()+pdf.sum(), wo
timeit("bsdf_sample", loop(f_sample), o,d,0)

# make_shading_frame + to_local/world
def f_frames(i,c,s0):
    acc,wo=c
    u=uniforms(0,pix,i+s0,0,2,0)
    nn=vm.normalize(h.normal+0.001*u[:,0:1])
    t2,b2,n2=vm.make_shading_frame(nn,h.dpdu)
    wol=vm.to_local(wo,t2,b2,n2)
    ww=vm.to_world(wol,t2,b2,n2)
    return acc+ww.sum(), wo
timeit("frames+transforms", loop(f_frames), o,d,0)
