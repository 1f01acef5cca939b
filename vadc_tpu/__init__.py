"""vadc_tpu — TPU-native streaming voice-activity-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the `vadc`
streaming Silero-VAD engine (reference: IntendedConsequence/vadc): raw 16 kHz
mono s16le PCM in, speech-segment timestamps out, with Silero v3.1 / v4 / v5
model families, golden-tensor fidelity tests, and a batched multi-stream
engine that scales to hundreds of concurrent realtime streams per TPU chip.

Layering (bottom to top):
  io/       .testtensor (de)serialization, PCM conversion, native wav
            codec + polyphase resampler, ffmpeg source
  nn/       pure-JAX NN ops (STFT, conv blocks, attention, LSTM, norms)
  models/   Silero v3.1 / v4 / v5 weight schemas + forwards
  kernels/  Pallas TPU kernels for the fused hot paths
  engine/   batched multi-stream runner, device mesh sharding
  cli/      vadc-compatible command line, segmentation state machine
  export/   weight extraction (torch jit / onnx -> testtensor)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences: vadc_tpu.api, vadc_tpu.native, ...
    if name in ("api", "native", "tracing", "runtime"):
        import importlib

        return importlib.import_module(f"vadc_tpu.{name}")
    raise AttributeError(f"module 'vadc_tpu' has no attribute {name!r}")
