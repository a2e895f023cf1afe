/* Golden generator for the high-sampling-factor JPEG specs
 * (MultimodalSpec "sampling factors 3-4").
 *
 * Drives the system libjpeg to encode a deterministic GRAY-AS-RGB
 * raster (R = G = B = (7x + 13y) mod 256 - gray input makes Cb = Cr =
 * 128 exactly in libjpeg's fixed-point converter, so "fancy" vs
 * replication chroma upsampling cannot differ and the comparison
 * tolerance stays the IDCT's own +-1) as baseline Huffman JPEGs with
 * luma sampling factors 4x1 / 3x1 / 1x4 / 4x2, then decodes them back
 * with libjpeg itself as the ground truth. Regenerate with:
 *   gcc gen_samp.c -ljpeg -o gen_samp
 *   ./gen_samp enc <w> <h> <hsamp> <vsamp> <quality> <out.jpg>
 *   ./gen_samp dec <in.jpg> <out.raw>   (raw = "w h ncomp\n", then samples)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(1); }

int main(int argc, char **argv) {
  if (argc < 2) die("mode?");
  if (strcmp(argv[1], "enc") == 0) {
    int w = atoi(argv[2]), h = atoi(argv[3]);
    int hs = atoi(argv[4]), vs = atoi(argv[5]);
    int quality = atoi(argv[6]);
    FILE *out = fopen(argv[7], "wb");
    if (!out) die("io");
    unsigned char *buf = malloc((size_t)w * h * 3);
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++) {
        unsigned char v = (unsigned char)((7 * x + 13 * y) % 256);
        buf[(y * (size_t)w + x) * 3] = v;
        buf[(y * (size_t)w + x) * 3 + 1] = v;
        buf[(y * (size_t)w + x) * 3 + 2] = v;
      }
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, out);
    cinfo.image_width = w; cinfo.image_height = h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.comp_info[0].h_samp_factor = hs;
    cinfo.comp_info[0].v_samp_factor = vs;
    cinfo.comp_info[1].h_samp_factor = 1;
    cinfo.comp_info[1].v_samp_factor = 1;
    cinfo.comp_info[2].h_samp_factor = 1;
    cinfo.comp_info[2].v_samp_factor = 1;
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
      JSAMPROW row = buf + (size_t)cinfo.next_scanline * w * 3;
      jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
  } else if (strcmp(argv[1], "dec") == 0) {
    FILE *in = fopen(argv[2], "rb");
    FILE *out = fopen(argv[3], "wb");
    if (!in || !out) die("io");
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, in);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_start_decompress(&cinfo);
    fprintf(out, "%d %d %d\n", cinfo.output_width, cinfo.output_height,
            cinfo.output_components);
    unsigned char *row = malloc((size_t)cinfo.output_width * cinfo.output_components);
    while (cinfo.output_scanline < cinfo.output_height) {
      jpeg_read_scanlines(&cinfo, &row, 1);
      fwrite(row, 1, (size_t)cinfo.output_width * cinfo.output_components, out);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
  } else die("mode must be enc or dec");
  return 0;
}
