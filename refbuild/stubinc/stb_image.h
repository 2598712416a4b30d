/* stb_image stand-in: the reference vendors stb_image.h but does not ship
 * it in the repo. This stub implements the one format needed to capture
 * texture goldens — binary PPM (P6, maxval 255), which the real
 * stb_image also reads natively (stbi__pnm_load) — and fails cleanly on
 * everything else (png/jpg), matching the old always-NULL stub there.
 * Parity fixture scenes use .ppm textures for exactly this reason;
 * EXR env maps go through OpenEXR (imagefile.h), not stb. */
#pragma once
#include <stddef.h>
#include <stdio.h>   /* the real stb_image.h pulls these in; texture.cpp */
#include <stdlib.h>  /* relies on that for fprintf/free */
#include <string.h>

#define STBI_rgb 3

typedef unsigned char stbi_uc;

static int stbi__pnm_token(FILE *f, char *buf, size_t cap)
{
    int c = fgetc(f);
    while (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '#') {
        if (c == '#')
            while ((c = fgetc(f)) != '\n' && c != EOF) {}
        c = fgetc(f);
    }
    size_t n = 0;
    while (c != EOF && c != ' ' && c != '\t' && c != '\r' && c != '\n') {
        if (n + 1 < cap) buf[n++] = (char)c;
        c = fgetc(f);
    }
    buf[n] = '\0';
    return n > 0;
}

static inline stbi_uc *stbi_load(const char *filename, int *x, int *y,
                                 int *comp, int req_comp)
{
    (void)req_comp;
    *x = 0; *y = 0; *comp = 0;
    FILE *f = fopen(filename, "rb");
    if (!f) return (stbi_uc *)0;
    char tok[64];
    if (!stbi__pnm_token(f, tok, sizeof tok) || strcmp(tok, "P6") != 0) {
        fclose(f);
        return (stbi_uc *)0;  /* png/jpg etc.: unsupported, as before */
    }
    int w = 0, h = 0, maxv = 0;
    if (!stbi__pnm_token(f, tok, sizeof tok)) { fclose(f); return 0; }
    w = atoi(tok);
    if (!stbi__pnm_token(f, tok, sizeof tok)) { fclose(f); return 0; }
    h = atoi(tok);
    if (!stbi__pnm_token(f, tok, sizeof tok)) { fclose(f); return 0; }
    maxv = atoi(tok);
    if (w <= 0 || h <= 0 || maxv != 255) { fclose(f); return 0; }
    size_t n = (size_t)w * h * 3;
    stbi_uc *data = (stbi_uc *)malloc(n);
    if (!data || fread(data, 1, n, f) != n) {
        free(data);
        fclose(f);
        return (stbi_uc *)0;
    }
    fclose(f);
    *x = w; *y = h; *comp = 3;
    return data;
}
