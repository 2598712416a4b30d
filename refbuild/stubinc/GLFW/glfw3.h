/* Headless GLFW stub: glfwCreateWindow returns NULL so the reference's
 * main() takes its no-window branch (main.cpp:227-231); glfwGetTime is
 * the only entry point with real behavior (it is the reference's clock,
 * used for accel-build and render timing in buildscene.h:704 and
 * main.cpp:287). */
#pragma once
#include <time.h>

#include "../GL/glew.h"

#define GLFW_PRESS 1
#define GLFW_KEY_Q 81
#define GLFW_KEY_P 80
#define GLFW_MOUSE_BUTTON_LEFT 0
#define GLFW_CONTEXT_VERSION_MAJOR 0x22002
#define GLFW_CONTEXT_VERSION_MINOR 0x22003
#define GLFW_OPENGL_PROFILE 0x22008
#define GLFW_OPENGL_CORE_PROFILE 0x32001
#define GLFW_OPENGL_FORWARD_COMPAT 0x22006
#define GLFW_RESIZABLE 0x20003

typedef struct GLFWwindow GLFWwindow;
typedef void (*GLFWkeyfun)(GLFWwindow *, int, int, int, int);
typedef void (*GLFWmousebuttonfun)(GLFWwindow *, int, int, int);

static inline int glfwInit(void) { return GL_TRUE; }
static inline double glfwGetTime(void)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}
static inline void glfwWindowHint(int h, int v) { (void)h; (void)v; }
static inline GLFWwindow *glfwCreateWindow(int w, int h, const char *t,
                                           void *m, void *s)
{
    (void)w; (void)h; (void)t; (void)m; (void)s;
    return (GLFWwindow *)0; /* headless: no window, ever */
}
static inline void glfwSetWindowPos(GLFWwindow *w, int x, int y) { (void)w; (void)x; (void)y; }
static inline void glfwMakeContextCurrent(GLFWwindow *w) { (void)w; }
static inline void glfwSwapBuffers(GLFWwindow *w) { (void)w; }
static inline void glfwPollEvents(void) {}
static inline GLFWkeyfun glfwSetKeyCallback(GLFWwindow *w, GLFWkeyfun f) { (void)w; (void)f; return 0; }
static inline GLFWmousebuttonfun glfwSetMouseButtonCallback(GLFWwindow *w, GLFWmousebuttonfun f) { (void)w; (void)f; return 0; }
static inline void glfwGetCursorPos(GLFWwindow *w, double *x, double *y) { (void)w; *x = 0.0; *y = 0.0; }
