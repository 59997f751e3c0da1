#!/usr/bin/env python
"""Thin wrapper over imagined_speech_decoding_tpu.cli.zero_shot (reference scripts/ layout)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imagined_speech_decoding_tpu.cli.zero_shot import main

if __name__ == "__main__":
    main()
