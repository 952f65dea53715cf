"""Genre-style unified entry point: `main.py --config x [--test]`
(SURVEY.md L8: "python main.py --config x.yaml [--test]").

Train by default; --test decodes the config's test manifest with the
configured decode mode. All train/decode flags pass through.

    python -m pytorch_end2end_speech_recognition_tpu.cli.main \
        --config libri960_conformer [--test] [--set k=v ...]
"""

from __future__ import annotations

import sys


def main(argv=None):
    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--test" in argv:
        argv.remove("--test")
        from pytorch_end2end_speech_recognition_tpu.cli import decode
        from pytorch_end2end_speech_recognition_tpu.cli.train import (
            load_config,
        )

        # default the manifest to the config's test set when not given
        if "--manifest" not in argv:
            try:
                i = argv.index("--config")
                cfg = load_config(argv[i + 1])
                argv += ["--manifest", cfg.data.test_manifest]
            except (ValueError, IndexError):
                pass
        decode.main(argv)
    else:
        from pytorch_end2end_speech_recognition_tpu.cli import train

        train.main(argv)


if __name__ == "__main__":
    main()
