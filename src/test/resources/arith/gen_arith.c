/* Golden generator for the arithmetic-JPEG specs (ArithJpegSpec).
 *
 * Drives the system libjpeg (which carries T.81 Annex D arithmetic
 * coding) to (a) ENCODE deterministic rasters as arithmetic-coded
 * JPEGs and (b) DECODE any JPEG back to raw samples - the ground
 * truth the Scala decoder is validated against. Regenerate with:
 *   gcc gen_arith.c -ljpeg -o gen_arith
 *   ./gen_arith enc <w> <h> <gray|rgb444|rgb420> <quality> <restart> <in.raw> <out.jpg>
 *   ./gen_arith dec <in.jpg> <out.raw>   (raw = w h ncomp ints, then samples)
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
    const char *mode = argv[4];
    int quality = atoi(argv[5]);
    int restart = atoi(argv[6]);
    int gray = strcmp(mode, "gray") == 0;
    int ncomp = gray ? 1 : 3;
    FILE *in = fopen(argv[7], "rb");
    FILE *out = fopen(argv[8], "wb");
    if (!in || !out) die("io");
    unsigned char *buf = malloc((size_t)w * h * ncomp);
    if (fread(buf, 1, (size_t)w * h * ncomp, in) != (size_t)w * h * ncomp) die("short raw");
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, out);
    cinfo.image_width = w; cinfo.image_height = h;
    cinfo.input_components = ncomp;
    cinfo.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = TRUE;            /* the point of this tool */
    cinfo.restart_interval = restart;
    if (!gray && strcmp(mode, "rgb444") == 0) {
      cinfo.comp_info[0].h_samp_factor = 1;
      cinfo.comp_info[0].v_samp_factor = 1;
    }
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
      JSAMPROW row = buf + (size_t)cinfo.next_scanline * w * ncomp;
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
    int w = cinfo.output_width, h = cinfo.output_height, nc = cinfo.output_components;
    fprintf(out, "%d %d %d\n", w, h, nc);
    unsigned char *row = malloc((size_t)w * nc);
    while (cinfo.output_scanline < cinfo.output_height) {
      JSAMPROW r = row;
      jpeg_read_scanlines(&cinfo, &r, 1);
      fwrite(row, 1, (size_t)w * nc, out);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
  } else die("mode must be enc|dec");
  return 0;
}
