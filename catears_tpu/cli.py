"""Command-line decoder (reference src/main.cc parity).

Usage: python -m catears_tpu.cli <config-file> <input-file>
  *.wav: decode this file, print the hypothesis.
  *.scp: decode `name path` entries, print `name hyp` per line.
"""

from __future__ import annotations

import sys

from catears_tpu.io.wav import read_scp
from catears_tpu.runtime.recognizer import Recognizer, decode_wav_file


def print_usage() -> None:
    print("Usage: catears <model-config> <input-file>")
    print("  Input-file:")
    print("    *.wav: decode this file.")
    print("    *.scp: decode audios listed in it.")
    sys.exit(1)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print_usage()
    config_file, input_file = argv
    if len(input_file) < 4:
        print_usage()

    recognizer = Recognizer(config_file)
    if input_file.endswith(".wav"):
        print(decode_wav_file(recognizer, input_file))
    else:
        for name, wav_path in read_scp(input_file):
            hyp = decode_wav_file(recognizer, wav_path)
            print(f"{name} {hyp}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
