/* Headless GLEW stub for building the reference renderer without a GPU.
 *
 * The reference (main.cpp, gl/glcode.h) only needs GL for its live
 * preview; with glfwCreateWindow returning NULL it takes the headless
 * branch (main.cpp:227-231: SHOW_PROGRESS=false, image_save=true), so
 * every GL entry point can be a no-op. Status queries report success so
 * the error-print paths stay quiet. */
#pragma once

typedef unsigned int GLuint;
typedef int GLint;
typedef int GLsizei;
typedef unsigned int GLenum;
typedef unsigned char GLboolean;
typedef char GLchar;
typedef float GLfloat;
typedef void GLvoid;
typedef long GLsizeiptr;
typedef unsigned int GLbitfield;

#define GL_TRUE 1
#define GL_FALSE 0
#define GL_VERTEX_SHADER 0x8B31
#define GL_FRAGMENT_SHADER 0x8B30
#define GL_COMPILE_STATUS 0x8B81
#define GL_LINK_STATUS 0x8B82
#define GL_ARRAY_BUFFER 0x8892
#define GL_STATIC_DRAW 0x88E4
#define GL_FLOAT 0x1406
#define GL_TEXTURE_2D 0x0DE1
#define GL_TEXTURE0 0x84C0
#define GL_TEXTURE_MIN_FILTER 0x2801
#define GL_TEXTURE_MAG_FILTER 0x2800
#define GL_NEAREST 0x2600
#define GL_RGB 0x1907
#define GL_UNSIGNED_BYTE 0x1401
#define GL_COLOR_BUFFER_BIT 0x4000
#define GL_DEPTH_BUFFER_BIT 0x0100
#define GL_TRIANGLES 0x0004
#define GLEW_OK 0

static GLboolean glewExperimental = GL_FALSE;
static inline GLenum glewInit(void) { return GLEW_OK; }

static inline GLuint glCreateShader(GLenum t) { (void)t; return 1; }
static inline void glShaderSource(GLuint s, GLsizei c, const GLchar *const *str, const GLint *len) { (void)s; (void)c; (void)str; (void)len; }
static inline void glCompileShader(GLuint s) { (void)s; }
static inline void glGetShaderiv(GLuint s, GLenum p, GLint *out) { (void)s; (void)p; *out = GL_TRUE; }
static inline void glGetShaderInfoLog(GLuint s, GLsizei n, GLsizei *l, GLchar *log) { (void)s; (void)n; (void)l; if (log) log[0] = 0; }
static inline GLuint glCreateProgram(void) { return 1; }
static inline void glAttachShader(GLuint p, GLuint s) { (void)p; (void)s; }
static inline void glBindFragDataLocation(GLuint p, GLuint c, const GLchar *n) { (void)p; (void)c; (void)n; }
static inline void glLinkProgram(GLuint p) { (void)p; }
static inline void glGetProgramiv(GLuint p, GLenum e, GLint *out) { (void)p; (void)e; *out = GL_TRUE; }
static inline void glGetProgramInfoLog(GLuint p, GLsizei n, GLsizei *l, GLchar *log) { (void)p; (void)n; (void)l; if (log) log[0] = 0; }
static inline void glDeleteShader(GLuint s) { (void)s; }
static inline void glUseProgram(GLuint p) { (void)p; }
static inline void glGenVertexArrays(GLsizei n, GLuint *a) { (void)n; *a = 1; }
static inline void glBindVertexArray(GLuint a) { (void)a; }
static inline void glGenBuffers(GLsizei n, GLuint *b) { (void)n; *b = 1; }
static inline void glBindBuffer(GLenum t, GLuint b) { (void)t; (void)b; }
static inline void glBufferData(GLenum t, GLsizeiptr s, const void *d, GLenum u) { (void)t; (void)s; (void)d; (void)u; }
static inline GLint glGetAttribLocation(GLuint p, const GLchar *n) { (void)p; (void)n; return 0; }
static inline void glEnableVertexAttribArray(GLuint i) { (void)i; }
static inline void glVertexAttribPointer(GLuint i, GLint sz, GLenum t, GLboolean nm, GLsizei st, const void *p) { (void)i; (void)sz; (void)t; (void)nm; (void)st; (void)p; }
static inline void glGenTextures(GLsizei n, GLuint *t) { (void)n; *t = 1; }
static inline void glActiveTexture(GLenum t) { (void)t; }
static inline void glBindTexture(GLenum t, GLuint h) { (void)t; (void)h; }
static inline void glTexParameteri(GLenum t, GLenum p, GLint v) { (void)t; (void)p; (void)v; }
static inline GLint glGetUniformLocation(GLuint p, const GLchar *n) { (void)p; (void)n; return 0; }
static inline void glUniform1i(GLint l, GLint v) { (void)l; (void)v; }
static inline void glTexImage2D(GLenum t, GLint lv, GLint f, GLsizei w, GLsizei h, GLint b, GLenum fm, GLenum ty, const void *d) { (void)t; (void)lv; (void)f; (void)w; (void)h; (void)b; (void)fm; (void)ty; (void)d; }
static inline void glClearColor(GLfloat r, GLfloat g, GLfloat b, GLfloat a) { (void)r; (void)g; (void)b; (void)a; }
static inline void glClear(GLbitfield m) { (void)m; }
static inline void glDrawArrays(GLenum m, GLint f, GLsizei c) { (void)m; (void)f; (void)c; }
