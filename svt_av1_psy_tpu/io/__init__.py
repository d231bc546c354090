"""Container and raw-video I/O (analog of Source/App/app_input_y4m.c,
app_output_ivf.c), plus an AVIF (ISOBMFF) muxer used both for the AVIF
still-image output mode and as the conformance-oracle path (PIL decodes
AVIF through libavif -> dav1d/aom, mirroring the reference E2E tests'
use of libaom as reference decoder, test/e2e_test/RefDecoder.cc)."""
