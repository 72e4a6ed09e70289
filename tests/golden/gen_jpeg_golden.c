/* Generate independent progressive-JPEG goldens with the system libjpeg.
 * For each case: write the progressive JPEG stream AND libjpeg's own
 * decode of that stream (raw interleaved samples) so the repo's pure-
 * python decoder can be asserted against a truly independent encoder.
 *
 * Decode uses do_fancy_upsampling=FALSE (replication) to match the
 * repo decoder's np.repeat upsampling; IDCT/colorspace rounding still
 * differs by a couple of LSBs, asserted with a small tolerance.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void fill_rgb(unsigned char *buf, int w, int h) {
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
            unsigned char *p = buf + 3 * (y * w + x);
            p[0] = (unsigned char)((x * 255) / (w - 1));
            p[1] = (unsigned char)((y * 255) / (h - 1));
            p[2] = (unsigned char)(((x * 7 + y * 13) % 64) * 4 +
                                   ((x / 4 + y / 4) % 2 ? 40 : 0));
        }
}

static void fill_gray(unsigned char *buf, int w, int h) {
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
            buf[y * w + x] =
                (unsigned char)(((x * 11 + y * 3) % 229) +
                                ((x % 8 < 4) ^ (y % 8 < 4) ? 26 : 0));
}

static void encode_progressive(const char *path, unsigned char *img, int w,
                               int h, int comps, int quality, int h_samp,
                               int v_samp) {
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr err;
    FILE *f = fopen(path, "wb");
    if (!f) { perror(path); exit(1); }
    c.err = jpeg_std_error(&err);
    jpeg_create_compress(&c);
    jpeg_stdio_dest(&c, f);
    c.image_width = w;
    c.image_height = h;
    c.input_components = comps;
    c.in_color_space = comps == 3 ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, quality, TRUE);
    if (comps == 3) {
        c.comp_info[0].h_samp_factor = h_samp;
        c.comp_info[0].v_samp_factor = v_samp;
        c.comp_info[1].h_samp_factor = 1;
        c.comp_info[1].v_samp_factor = 1;
        c.comp_info[2].h_samp_factor = 1;
        c.comp_info[2].v_samp_factor = 1;
    }
    jpeg_simple_progression(&c);
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = img + (size_t)c.next_scanline * w * comps;
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    jpeg_destroy_compress(&c);
    fclose(f);
}

static void decode_to_raw(const char *jpeg_path, const char *raw_path) {
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr err;
    FILE *in = fopen(jpeg_path, "rb");
    FILE *out = fopen(raw_path, "wb");
    if (!in || !out) { perror("decode io"); exit(1); }
    d.err = jpeg_std_error(&err);
    jpeg_create_decompress(&d);
    jpeg_stdio_src(&d, in);
    jpeg_read_header(&d, TRUE);
    d.do_fancy_upsampling = FALSE; /* match replication upsampling */
    jpeg_start_decompress(&d);
    size_t stride = (size_t)d.output_width * d.output_components;
    unsigned char *row = malloc(stride);
    fprintf(stderr, "%s: %ux%u c=%d progressive=%d\n", jpeg_path,
            d.output_width, d.output_height, d.output_components,
            jpeg_has_multiple_scans(&d));
    while (d.output_scanline < d.output_height) {
        JSAMPROW rp = row;
        jpeg_read_scanlines(&d, &rp, 1);
        fwrite(row, 1, stride, out);
    }
    free(row);
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    fclose(in);
    fclose(out);
}

int main(void) {
    /* case 1: RGB 33x29, q90, 2x2 subsampling (default), odd dims */
    {
        int w = 33, h = 29;
        unsigned char *img = malloc((size_t)w * h * 3);
        fill_rgb(img, w, h);
        encode_progressive("/tmp/golden_rgb_q90_s22.jpg", img, w, h, 3, 90, 2, 2);
        decode_to_raw("/tmp/golden_rgb_q90_s22.jpg", "/tmp/golden_rgb_q90_s22.raw");
        free(img);
    }
    /* case 2: RGB 24x16, q50, no subsampling */
    {
        int w = 24, h = 16;
        unsigned char *img = malloc((size_t)w * h * 3);
        fill_rgb(img, w, h);
        encode_progressive("/tmp/golden_rgb_q50_s11.jpg", img, w, h, 3, 50, 1, 1);
        decode_to_raw("/tmp/golden_rgb_q50_s11.jpg", "/tmp/golden_rgb_q50_s11.raw");
        free(img);
    }
    /* case 3: grayscale 24x17, q75 */
    {
        int w = 24, h = 17;
        unsigned char *img = malloc((size_t)w * h);
        fill_gray(img, w, h);
        encode_progressive("/tmp/golden_gray_q75.jpg", img, w, h, 1, 75, 1, 1);
        decode_to_raw("/tmp/golden_gray_q75.jpg", "/tmp/golden_gray_q75.raw");
        free(img);
    }
    return 0;
}
