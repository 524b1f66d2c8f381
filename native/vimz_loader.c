/* vimz_loader — native witness-input loader (C, CPython extension).
 *
 * The reference's data path is native end-to-end (Rust serde JSON parsing +
 * ark-bn254 field decoding, vimz/src/input.rs:8-105). The Python pipeline's
 * equivalent hot spot is turning witness JSON hex words into 16x16-bit limb
 * arrays: the pure-Python path (int(x, 16) per word, then per-element
 * object-int shifts) costs tens of seconds at 4K/8K scale. This module
 * parses newline-separated hex tokens straight into uint32 limb buffers in
 * one pass.
 *
 * Exposed functions (see vimz_tpu/utils/native.py for the loader):
 *   hex_words_to_limbs(data: bytes, n_words: int) -> bytes
 *     data: n_words hex tokens (with or without 0x) separated by '\n'.
 *     returns n_words * 16 uint32 little-endian limbs as raw bytes.
 *   pack_pixels_to_limbs(rgb: bytes, n_words: int) -> bytes
 *     rgb: n_words * 30 bytes (10 pixels x RGB per word, LE packing,
 *     reference vimz/src/image_hash.rs:50-56). Returns limbs as above.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

#define NLIMB 16
#define LIMB_BITS 16

static int hex_val(char c) {
    if (c >= '0' && c <= '9') return c - '0';
    if (c >= 'a' && c <= 'f') return c - 'a' + 10;
    if (c >= 'A' && c <= 'F') return c - 'A' + 10;
    return -1;
}

/* Parse one hex token (no 0x prefix handling here) of length len into
 * 16 uint32 limbs (16 bits each, little-endian). Values must fit 256 bits.
 * Returns 0 on success. */
static int parse_token(const char *tok, Py_ssize_t len, uint32_t *limbs) {
    memset(limbs, 0, NLIMB * sizeof(uint32_t));
    if (len > 64) {
        /* leading digits must be zero to fit 256 bits */
        Py_ssize_t extra = len - 64;
        for (Py_ssize_t i = 0; i < extra; i++) {
            if (tok[i] != '0') return -1;
        }
        tok += extra;
        len = 64;
    }
    /* nibble i from the right contributes to limb (i / 4), shift (i % 4) * 4 */
    for (Py_ssize_t i = 0; i < len; i++) {
        int v = hex_val(tok[len - 1 - i]);
        if (v < 0) return -1;
        limbs[i >> 2] |= (uint32_t)v << ((i & 3) << 2);
    }
    return 0;
}

static PyObject *hex_words_to_limbs(PyObject *self, PyObject *args) {
    Py_buffer buf;
    Py_ssize_t n_words;
    if (!PyArg_ParseTuple(args, "y*n", &buf, &n_words)) return NULL;

    PyObject *out = PyBytes_FromStringAndSize(NULL, n_words * NLIMB * sizeof(uint32_t));
    if (!out) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    uint32_t *limbs = (uint32_t *)PyBytes_AS_STRING(out);
    const char *p = (const char *)buf.buf;
    const char *end = p + buf.len;
    Py_ssize_t w = 0;

    while (w < n_words) {
        while (p < end && (*p == '\n' || *p == ' ' || *p == '\r')) p++;
        const char *tok = p;
        while (p < end && *p != '\n' && *p != ' ' && *p != '\r') p++;
        Py_ssize_t len = p - tok;
        if (len == 0) break;
        if (len > 2 && tok[0] == '0' && (tok[1] == 'x' || tok[1] == 'X')) {
            tok += 2;
            len -= 2;
        }
        if (parse_token(tok, len, limbs + w * NLIMB) != 0) {
            Py_DECREF(out);
            PyBuffer_Release(&buf);
            PyErr_Format(PyExc_ValueError, "bad hex token at word %zd", w);
            return NULL;
        }
        w++;
    }
    PyBuffer_Release(&buf);
    if (w != n_words) {
        Py_DECREF(out);
        PyErr_Format(PyExc_ValueError, "expected %zd words, got %zd", n_words, w);
        return NULL;
    }
    return out;
}

static PyObject *pack_pixels_to_limbs(PyObject *self, PyObject *args) {
    Py_buffer buf;
    Py_ssize_t n_words;
    if (!PyArg_ParseTuple(args, "y*n", &buf, &n_words)) return NULL;
    if (buf.len < n_words * 30) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer too small for n_words * 30 bytes");
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, n_words * NLIMB * sizeof(uint32_t));
    if (!out) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    uint32_t *limbs = (uint32_t *)PyBytes_AS_STRING(out);
    const uint8_t *px = (const uint8_t *)buf.buf;
    for (Py_ssize_t w = 0; w < n_words; w++) {
        const uint8_t *b = px + w * 30;
        uint32_t *l = limbs + w * NLIMB;
        /* 30 LE bytes -> 15 16-bit limbs, top limb zero */
        for (int i = 0; i < 15; i++) {
            l[i] = (uint32_t)b[2 * i] | ((uint32_t)b[2 * i + 1] << 8);
        }
        l[15] = 0;
    }
    PyBuffer_Release(&buf);
    return out;
}

static PyMethodDef Methods[] = {
    {"hex_words_to_limbs", hex_words_to_limbs, METH_VARARGS,
     "Parse newline-separated hex tokens into uint32 limb bytes."},
    {"pack_pixels_to_limbs", pack_pixels_to_limbs, METH_VARARGS,
     "Pack 10-pixel RGB byte groups into uint32 limb bytes."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "vimz_loader",
    "Native witness-input loader for vimz-tpu.", -1, Methods,
};

PyMODINIT_FUNC PyInit_vimz_loader(void) { return PyModule_Create(&moduledef); }
