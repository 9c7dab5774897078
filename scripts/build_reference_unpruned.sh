#!/bin/bash
# Build the reference binary with (a) the GC fix (see
# build_reference_fixed.sh) and (b) kBeamSize raised 30000 -> 3000000 so
# its max-active token cap NEVER binds (src/decoder.cc:213-225: the
# sampled-cutoff path only triggers when prev_toks_.size() > kBeamSize).
# Pruning is then exactly the beam-width-16 threshold — the same
# "effectively unpruned" budget as our decoder at a beam_size no frame
# fills.  Used by scripts/realism.py PARITY_DEEP=1 to show the residual
# transcript mismatches at comparable budgets are pruning-order effects
# that vanish when neither engine's token cap binds.
set -e
REF=${1:-/root/reference}
OUT=${2:-/tmp/refbuild_unpruned}
SRC="$OUT/src_patched"
rm -rf "$SRC"
mkdir -p "$OUT"
cp -r "$REF" "$SRC"
python3 - "$SRC/src/pool.h" <<'EOF'
import sys
p = sys.argv[1]
s = open(p).read()
n = s.count("this->current_pos_ - 1")
assert n == 2, f"expected 2 occurrences, found {n}"
open(p, "w").write(s.replace("this->current_pos_ - 1",
                             "this->current_pos_"))
EOF
python3 - "$SRC/src/decoder.h" <<'EOF'
import sys
p = sys.argv[1]
s = open(p).read()
old = "static constexpr int kBeamSize = 30000;"
assert s.count(old) == 1
open(p, "w").write(s.replace(
    old, "static constexpr int kBeamSize = 3000000;"))
EOF
bash "$(dirname "$0")/build_reference.sh" "$SRC" "$OUT"
