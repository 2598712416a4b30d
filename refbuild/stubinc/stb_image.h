/* stb_image stub: the reference vendors stb_image.h but does not ship it
 * in the repo. Image-file textures (png/jpg) always fail to load under
 * this stub — the parity fixture scenes (cornell_box.txt,
 * example_scene.txt, test_scene2.txt) use none; EXR env maps go through
 * OpenEXR (imagefile.h), not stb. */
#pragma once
#include <stddef.h>
#include <stdio.h>   /* the real stb_image.h pulls these in; texture.cpp */
#include <stdlib.h>  /* relies on that for fprintf/free */

#define STBI_rgb 3

typedef unsigned char stbi_uc;

static inline stbi_uc *stbi_load(const char *filename, int *x, int *y,
                                 int *comp, int req_comp)
{
    (void)filename; (void)req_comp;
    *x = 0; *y = 0; *comp = 0;
    return (stbi_uc *)0;
}
