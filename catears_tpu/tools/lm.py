"""ARPA language-model utilities: unigram pruning and unigram cost vectors.

Parity with reference tool/prune_lm.py (strip an ARPA LM to order-1 for the
HCLG G and the delta-LM subtraction vector) and tool/convert_unigram.py
(ARPA unigram section + vocab -> VEC0 cost array in natural log, <s> := 0).
"""

from __future__ import annotations

import math
import sys
from typing import Dict, Iterable, List

import numpy as np

from catears_tpu.io.binfmt import write_vec0

M_LN10 = math.log(10.0)


def prune_to_unigram(lines: Iterable[str]) -> List[str]:
    """Keep only the \\data\\ header (ngram 1 line) and \\1-grams section."""
    out: List[str] = []
    state = "begin"
    for raw in lines:
        line = raw.strip()
        if state == "begin":
            if line in ("", "iARPA"):
                continue
            if line == "\\data\\":
                out.append(line)
                state = "data"
            else:
                raise ValueError(f"unexpected line: {line}")
        elif state == "data":
            if line == "":
                out.append(line)
            elif "=" in line:
                if line.split("=")[0].strip() == "ngram 1":
                    out.append(line)
            elif line == "\\1-grams:":
                out.append(line)
                state = "unigram"
            else:
                raise ValueError(f"unexpected line: {line}")
        elif state == "unigram":
            if line == "":
                out.append(line)
            elif line.startswith("\\"):
                state = "end" if line == "\\end\\" else "ngram"
            else:
                fields = line.split()
                if len(fields) in (2, 3):
                    out.append(f"{fields[0]} {fields[1]}")
                else:
                    raise ValueError(f"unexpected line: {line}")
        elif state == "ngram":
            if line == "\\end\\":
                state = "end"
    if state != "end":
        raise ValueError("unexpected end-of-file")
    out.append("\\end\\")
    return out


def read_unigram_costs(path: str) -> Dict[str, float]:
    """Word -> log10 probability from an ARPA file's 1-grams section."""
    costs: Dict[str, float] = {}
    state = "begin"
    with open(path, encoding="utf-8") as fd:
        for raw in fd:
            line = raw.strip()
            if state == "begin":
                if line == "\\data\\":
                    state = "data"
            elif state == "data":
                if line == "\\1-grams:":
                    state = "unigram"
            elif state == "unigram":
                if not line:
                    continue
                if line == "\\end\\" or line.startswith("\\"):
                    state = "end"
                    break
                fields = line.split()
                if len(fields) in (2, 3):
                    costs[fields[1]] = float(fields[0])
    return costs


def build_cost_vector(costs: Dict[str, float],
                      vocab: Dict[str, int]) -> np.ndarray:
    """log10 probs + vocab ids -> natural-log cost array (-logp)."""
    size = max(vocab.values()) + 1
    arr = np.full(size, np.inf, np.float32)
    for word, logp in costs.items():
        if word not in vocab:
            if word == "<unk>":
                continue
            raise ValueError(f"unexpected word: {word}")
        arr[vocab[word]] = -logp * M_LN10
    return arr


def read_vocab(path: str) -> Dict[str, int]:
    vocab: Dict[str, int] = {}
    with open(path, encoding="utf-8") as fd:
        for raw in fd:
            line = raw.strip()
            if not line:
                continue
            fields = line.split()
            if len(fields) != 2:
                raise ValueError(f"unexpected vocab line: {line}")
            vocab[fields[0]] = int(fields[1])
    return vocab


def main_prune(argv=None) -> int:
    """stdin ARPA -> stdout order-1 ARPA (tool/prune_lm.py parity)."""
    for line in prune_to_unigram(sys.stdin):
        print(line)
    return 0


def main_convert_unigram(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3:
        print("Usage: python -m catears_tpu.tools.lm "
              "<lm_arpa> <vocab> <unigram_bin>")
        return 22
    costs = read_unigram_costs(argv[0])
    costs["<s>"] = 0.0
    vocab = read_vocab(argv[1])
    arr = build_cost_vector(costs, vocab)
    with open(argv[2], "wb") as fd:
        write_vec0(fd, arr)
    print("ok")
    return 0


if __name__ == "__main__":
    sys.exit(main_convert_unigram())
