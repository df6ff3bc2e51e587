/* Golden-oracle helper for the arithmetic-JPEG suite: a ~150-line
 * wrapper over the SYSTEM libjpeg (Debian libjpeg62-turbo, an
 * independent implementation of ITU T.81) compiled on demand by
 * tests/test_jpeg_arith.py (skipped when gcc or the library is
 * absent).  Three modes on stdin/stdout:
 *
 *   enc <w> <h> <quality> <arith 0|1> [progressive 0|1] [restart N]
 *       raw RGB (w*h*3 bytes) on stdin  -> JPEG bytes on stdout
 *   dec
 *       JPEG on stdin -> "w h ncomp\n" + raw RGB bytes on stdout
 *   coef
 *       JPEG on stdin -> per-component EXACT quantized coefficient
 *       dump (text): "comp <i> <blocks_h> <blocks_w>\n" then one
 *       64-int line per block in raster block order.  This is the
 *       entropy-layer truth jpeg_read_coefficients exposes, free of
 *       any IDCT rounding convention, so the pure-Python arithmetic
 *       entropy decoder can be compared EXACTLY.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

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

int main(int argc, char **argv) {
    struct jpeg_error_mgr jerr;
    if (argc >= 6 && !strcmp(argv[1], "enc")) {
        int w = atoi(argv[2]), h = atoi(argv[3]), q = atoi(argv[4]);
        int arith = atoi(argv[5]);
        int prog = argc > 6 ? atoi(argv[6]) : 0;
        int restart = argc > 7 ? atoi(argv[7]) : 0;
        size_t need = (size_t)w * h * 3, n;
        unsigned char *rgb = read_all(stdin, &n);
        if (n < need) { fprintf(stderr, "short RGB input\n"); return 2; }
        struct jpeg_compress_struct c;
        c.err = jpeg_std_error(&jerr);
        jpeg_create_compress(&c);
        unsigned char *out = NULL; unsigned long outn = 0;
        jpeg_mem_dest(&c, &out, &outn);
        c.image_width = w; c.image_height = h;
        c.input_components = 3; c.in_color_space = JCS_RGB;
        jpeg_set_defaults(&c);
        jpeg_set_quality(&c, q, TRUE);
        c.arith_code = arith ? TRUE : FALSE;
        if (prog) jpeg_simple_progression(&c);
        c.restart_interval = restart;
        c.optimize_coding = FALSE;
        jpeg_start_compress(&c, TRUE);
        while (c.next_scanline < c.image_height) {
            JSAMPROW row = rgb + (size_t)c.next_scanline * w * 3;
            jpeg_write_scanlines(&c, &row, 1);
        }
        jpeg_finish_compress(&c);
        fwrite(out, 1, outn, stdout);
        jpeg_destroy_compress(&c);
        return 0;
    }
    if (argc >= 2 && (!strcmp(argv[1], "dec") || !strcmp(argv[1], "coef"))) {
        size_t n;
        unsigned char *jpg = read_all(stdin, &n);
        struct jpeg_decompress_struct d;
        d.err = jpeg_std_error(&jerr);
        jpeg_create_decompress(&d);
        jpeg_mem_src(&d, jpg, n);
        jpeg_read_header(&d, TRUE);
        if (!strcmp(argv[1], "coef")) {
            jvirt_barray_ptr *coefs = jpeg_read_coefficients(&d);
            for (int ci = 0; ci < d.num_components; ci++) {
                jpeg_component_info *comp = d.comp_info + ci;
                JDIMENSION bh = comp->height_in_blocks, bw = comp->width_in_blocks;
                printf("comp %d %u %u\n", ci, bh, bw);
                for (JDIMENSION by = 0; by < bh; by++) {
                    JBLOCKARRAY rows = (d.mem->access_virt_barray)(
                        (j_common_ptr)&d, coefs[ci], by, 1, FALSE);
                    for (JDIMENSION bx = 0; bx < bw; bx++) {
                        for (int k = 0; k < 64; k++)
                            printf(k ? " %d" : "%d", rows[0][bx][k]);
                        printf("\n");
                    }
                }
            }
            jpeg_finish_decompress(&d);
            jpeg_destroy_decompress(&d);
            return 0;
        }
        d.do_fancy_upsampling = FALSE;  /* replicate chroma like the
                                           pure-Python pipeline */
        jpeg_start_decompress(&d);
        printf("%u %u %d\n", d.output_width, d.output_height,
               d.output_components);
        fflush(stdout);
        size_t stride = (size_t)d.output_width * d.output_components;
        unsigned char *row = malloc(stride);
        while (d.output_scanline < d.output_height) {
            JSAMPROW r = row;
            jpeg_read_scanlines(&d, &r, 1);
            fwrite(row, 1, stride, stdout);
        }
        jpeg_finish_decompress(&d);
        jpeg_destroy_decompress(&d);
        return 0;
    }
    fprintf(stderr, "usage: enc w h q arith [prog] | dec | coef\n");
    return 2;
}
