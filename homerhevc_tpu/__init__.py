"""homerhevc_tpu — a TPU-native HEVC (H.265) encoder built from scratch in JAX.

Functionally equivalent to the HomerHEVC reference encoder
(/root/reference, jcasal-homer/HomerHEVC), but architecturally idiomatic to
TPUs: batched whole-frame mode decision on the MXU, integer transforms as
matmuls, wavefront reconstruction as `lax.scan`/`shard_map` passes, and
host-side CABAC entropy coding feeding an Annex-B bitstream writer.

Layer map (mirrors SURVEY.md §1):
  api.py / config.py      — public API + config (ref: homer_hevc_enc_api.h)
  tables.py               — spec constant tables (ref: hmr_tables.c)
  ops/                    — device compute: transforms, quant, intra, inter,
                            pixel metrics, deblock, SAO (ref: hmr_transform.c,
                            hmr_quant.c, hmr_motion_*.c, hmr_sse42_*)
  entropy/                — bitstream, CABAC, syntax, headers (ref:
                            hmr_bitstream.c, hmr_binary_encoding.c,
                            hmr_arithmetic_encoding.c, hmr_headers.c)
  pipeline/               — frame/GOP orchestration, rate control (ref:
                            hmr_encoder_lib.c, hmr_rate_control.c)
  parallel/               — mesh/sharding (replaces WPP threads + engines)
  utils/                  — YUV I/O, PSNR (ref: homer_app.c, hmr_metics.c)
  validate/               — libde265-based conformance checking (test only)
"""

__version__ = "0.1.0"
