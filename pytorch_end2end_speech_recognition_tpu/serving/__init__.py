"""AOT serving exports (jax.export / StableHLO)."""

from pytorch_end2end_speech_recognition_tpu.serving.export import (  # noqa: F401
    ServingBundle,
    export_bundle,
    load_bundle,
)
