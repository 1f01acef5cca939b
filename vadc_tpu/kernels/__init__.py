"""Pallas TPU kernels.

Compiled-on-TPU today (the environment's Mosaic toolchain accepts the
2-D-dot subset; see docs/PERFORMANCE.md):
  * lstm.lstm_fused, lstm.lstm_decoder_fused
  * silero_v31_fused2d.forward_fused2d (whole encoder+LSTM+decoder)

Interpret-verified, awaiting a full Mosaic toolchain:
  * silero_v31_fused.forward_fused (the natural 3-D formulation)
"""

from vadc_tpu.kernels.lstm import lstm_fused, lstm_decoder_fused

__all__ = ["lstm_fused", "lstm_decoder_fused"]
