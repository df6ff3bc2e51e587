/* Golden-oracle helper for the PNG suite: a small wrapper over the
 * SYSTEM libpng (Debian libpng16 — an independent implementation of
 * RFC 2083 / the PNG spec) compiled on demand by
 * tests/test_png_golden.py (skipped when gcc or png.h is absent).
 * Until round 11 the PNG decoder was gated only against the in-test
 * encoder — two implementations by the same author can share a
 * misunderstanding (the failure class ADVICE r10 caught in the VP8
 * RGB conversion); this tool provides the independent side.
 *
 * Modes on stdin/stdout:
 *
 *   dec
 *       PNG on stdin -> "w h channels\n" + 8-bit samples row-major.
 *       Transforms mirror the pure-Python decoder's documented
 *       conventions: palette -> RGB, gray<8 -> 8-bit (bit
 *       replication), 16-bit -> high byte (png_set_strip_16).
 *   enc <w> <h> <color_type> <bit_depth> <interlace>
 *       raw samples on stdin (8- or 16-bit per the depth, row-major,
 *       big-endian for 16) -> PNG on stdout.  libpng picks its own
 *       adaptive per-row filters, so fresh encodes exercise the
 *       unfilter paths with independently chosen filter types.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <png.h>

static unsigned char *read_all(FILE *f, size_t *n) {
    size_t cap = 1 << 20, len = 0;
    unsigned char *buf = malloc(cap);
    size_t got;
    while ((got = fread(buf + len, 1, cap - len, f)) > 0) {
        len += got;
        if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
    }
    *n = len;
    return buf;
}

struct mem_src { const unsigned char *p; size_t n, off; };

static void mem_read(png_structp png, png_bytep out, png_size_t want) {
    struct mem_src *s = png_get_io_ptr(png);
    if (s->off + want > s->n) png_error(png, "short read");
    memcpy(out, s->p + s->off, want);
    s->off += want;
}

int main(int argc, char **argv) {
    if (argc >= 2 && !strcmp(argv[1], "dec")) {
        size_t n;
        unsigned char *data = read_all(stdin, &n);
        struct mem_src src = { data, n, 0 };
        png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
        png_infop info = png_create_info_struct(png);
        if (setjmp(png_jmpbuf(png))) { fprintf(stderr, "libpng dec error\n"); return 3; }
        png_set_read_fn(png, &src, mem_read);
        png_read_info(png, info);
        png_set_expand(png);       /* palette->RGB, gray<8 -> 8, tRNS->alpha */
        png_set_strip_16(png);     /* 16-bit -> high byte */
        png_read_update_info(png, info);
        png_uint_32 w = png_get_image_width(png, info);
        png_uint_32 h = png_get_image_height(png, info);
        int ch = png_get_channels(png, info);
        size_t stride = png_get_rowbytes(png, info);
        unsigned char *img = malloc(stride * h);
        png_bytep *rows = malloc(sizeof(png_bytep) * h);
        for (png_uint_32 y = 0; y < h; y++) rows[y] = img + y * stride;
        png_read_image(png, rows);  /* handles Adam7 internally */
        printf("%u %u %d\n", w, h, ch);
        fflush(stdout);
        fwrite(img, 1, stride * h, stdout);
        png_destroy_read_struct(&png, &info, NULL);
        return 0;
    }
    if (argc >= 7 && !strcmp(argv[1], "enc")) {
        int w = atoi(argv[2]), h = atoi(argv[3]);
        int color = atoi(argv[4]), depth = atoi(argv[5]);
        int interlace = atoi(argv[6]) ? PNG_INTERLACE_ADAM7 : PNG_INTERLACE_NONE;
        int ch = color == 2 ? 3 : color == 4 ? 2 : color == 6 ? 4 : 1;
        size_t stride = ((size_t)w * ch * depth + 7) / 8, n;
        unsigned char *raw = read_all(stdin, &n);
        if (n < stride * h) { fprintf(stderr, "short raw input\n"); return 2; }
        png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
        png_infop info = png_create_info_struct(png);
        if (setjmp(png_jmpbuf(png))) { fprintf(stderr, "libpng enc error\n"); return 3; }
        png_init_io(png, stdout);
        png_set_IHDR(png, info, w, h, depth, color, interlace,
                     PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
        png_write_info(png, info);
        png_bytep *rows = malloc(sizeof(png_bytep) * h);
        for (int y = 0; y < h; y++) rows[y] = raw + (size_t)y * stride;
        png_write_image(png, rows);
        png_write_end(png, NULL);
        png_destroy_write_struct(&png, &info);
        return 0;
    }
    fprintf(stderr, "usage: dec | enc w h color depth interlace\n");
    return 2;
}
