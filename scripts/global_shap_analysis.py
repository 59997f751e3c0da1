#!/usr/bin/env python
"""Thin wrapper over imagined_speech_decoding_tpu.cli.global_explain (reference scripts/ layout)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imagined_speech_decoding_tpu.cli.global_explain import main

if __name__ == "__main__":
    main()
