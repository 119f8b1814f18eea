#!/usr/bin/env bash
# Reference-surface parity with utils/download_data.sh (1% subset).
python -m onebit_asr_tpu.cli.download --subset 0.01 --cache-dir data
