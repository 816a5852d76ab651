#!/bin/bash
# Regenerate golden outputs from the reference minimap2 binary.
# Usage: MM2=/tmp/mm2build/minimap2 bash tests/make_goldens.sh
# Goldens are the parity spec: byte-level targets for the TPU framework.
set -euo pipefail
MM2=${MM2:-/tmp/mm2build/minimap2}
D=$(dirname "$0")/data
G=$(dirname "$0")/golden

run() { # run <name> <args...>
  local name=$1; shift
  "$MM2" "$@" > "$G/$name.out" 2> "$G/$name.err" || true
}

# Canonical end-to-end checks (SURVEY.md §4)
run mt-paf          -c --cs "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-sam          -a "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-sam-eqx      -a --eqx --MD "$D/MT-human.fa" "$D/MT-orang.fa"
run t2-paf          -cx splice -k14 -w4 -m10 -s10 "$D/t2.fa" "$D/q2.fa"
run t2-sam          -ax splice -k14 -w4 -m10 -s10 "$D/t2.fa" "$D/q2.fa"
run inv-paf         -c --cs "$D/t-inv.fa" "$D/q-inv.fa"
run inv-sam         -a "$D/t-inv.fa" "$D/q-inv.fa"
run x3s-splice-sam  -ax splice "$D/x3s-ref.fa" "$D/x3s-qry.fa"
run x3s-splice-paf  -cx splice --cs "$D/x3s-ref.fa" "$D/x3s-qry.fa"
run x3s-juncbed     -ax splice --junc-bed "$D/x3s-junc.bed" "$D/x3s-ref.fa" "$D/x3s-qry.fa"
run x3s-spsc        -ax splice --spsc "$D/x3s.spsc" "$D/x3s-ref.fa" "$D/x3s-qry.fa"
run x3s-jump        -ax splice:sr -j "$D/x3s-anno.bed" "$D/x3s-ref.fa" "$D/jumpreads.fa"
run x3s-wj          -cx splice --write-junc "$D/x3s-ref.fa" "$D/x3s-qry.fa"
run x3s-srrna       -ax splice:sr "$D/x3s-ref.fa" "$D/jumpreads.fa"
cat "$D/MT-human.fa" "$D/MT-orang.fa" > "$D/MT-both.fa"
run mt-ava          -x ava-ont "$D/MT-both.fa" "$D/MT-both.fa"
run mt-asm          -cx asm20 "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-nocig        "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-hifi         -cx map-hifi "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-pb           -cx map-pb "$D/MT-human.fa" "$D/MT-orang.fa"
run sr-sam          -ax sr "$D/MT-human.fa" "$D/sr-r1.fq" "$D/sr-r2.fq"
run mt-dust         -c -T20 "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-alt          -c --alt "$D/alt.txt" "$D/MT-both.fa" "$D/MT-orang.fa"
run mt-split        -c -I 10k --split-prefix /tmp/mm2sp "$D/MT-both.fa" "$D/MT-orang.fa"
run sr-paf          -x sr "$D/MT-human.fa" "$D/sr-r1.fq" "$D/sr-r2.fq"

# Intermediate goldens: deterministic debug dumps (single-threaded by design)
run mt-seeds        -t1 --print-seeds "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-chains       -t1 --print-chains "$D/MT-human.fa" "$D/MT-orang.fa"
run x3s-chains      -t1 -x splice --print-chains "$D/x3s-ref.fa" "$D/x3s-qry.fa"

echo "goldens written to $G"
run mt-alnseq       -a --print-aln-seq "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-seedocc      --dbg-seed-occ "$D/MT-human.fa" "$D/MT-orang.fa"

# Option-wiring goldens (round 4: -o and chain-tuning long options)
run mt-gapscale     --chain-gap-scale 3.0 --chain-skip-scale 1.0 "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-seed         --seed 42 -c "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-dplen        --min-dp-len 1000 -c "$D/MT-human.fa" "$D/MT-orang.fa"
run mt-optmisc      --max-chain-skip 1 --max-chain-iter 20 --mask-len 500 --heap-sort=yes --rmq=no "$D/MT-human.fa" "$D/MT-orang.fa"
run inv-endbonus    --end-bonus 50 -a "$D/t-inv.fa" "$D/q-inv.fa"
