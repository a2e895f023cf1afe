/* progressive-arithmetic variant: same as gen_arith.c enc mode but
 * with jpeg_simple_progression() */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>
static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(1); }
int main(int argc, char **argv) {
  int w = atoi(argv[1]), h = atoi(argv[2]);
  const char *mode = argv[3];
  int quality = atoi(argv[4]);
  int gray = strcmp(mode, "gray") == 0;
  int ncomp = gray ? 1 : 3;
  FILE *in = fopen(argv[5], "rb");
  FILE *out = fopen(argv[6], "wb");
  if (!in || !out) die("io");
  unsigned char *buf = malloc((size_t)w * h * ncomp);
  if (fread(buf, 1, (size_t)w*h*ncomp, in) != (size_t)w*h*ncomp) die("short");
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
  cinfo.arith_code = TRUE;
  jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = buf + (size_t)cinfo.next_scanline * w * ncomp;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  return 0;
}
