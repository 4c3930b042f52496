#!/usr/bin/env python
"""Entry point: python main.py --model sfno --model-version film --train ...

Mirrors the reference CLI surface (main.py) over the TPU-native framework;
see msfno_tpu/cli.py for the argument groups and dispatch.
"""

from msfno_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
