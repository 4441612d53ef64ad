#!/bin/sh
# Round-5 per-family trainability evidence (VERDICT r4 item 4): short real
# training runs on the shapes corpus for the three families that had only
# unit/smoke coverage — pelee304, ssd_lite_mobilenet_v2, ssd512_vgg16 —
# each with the r3/r4 protocol: fresh stage, mid-run --resume stage,
# final --test-only eval. Logs land in this directory (committed unedited).
#
# Corpus: tools/make_dataset.py --root .data/shapes --train 1500 --val 200
# (same 6-class corpus as docs/trainrun_r3 + _r4).
#
# Run from the repo root: sh docs/trainrun_r5/run.sh
set -x
D=docs/trainrun_r5
mkdir -p runs

COMMON="--dataset coco --data-path .data/shapes --num-classes 91
  --warmup-iters 500 --num-workers 2 --print-freq 10 --bf16 --seed 0
  --score-thresh 0.01"

# ---- family 1: pelee304 (BN trunk -> the r3 lr-0.02 recipe) -------------
M="--model pelee304 --batch-size 32 --lr 0.02 --lr-steps 10 14
   --output-dir runs/pelee_r5"
python -m demonet_tpu.train $COMMON $M --epochs 10 \
    > $D/pelee_stage1.log 2>&1
echo "pelee stage1 rc=$?"
python -m demonet_tpu.train $COMMON $M --epochs 16 \
    --resume runs/pelee_r5/checkpoint_9 > $D/pelee_stage2.log 2>&1
echo "pelee stage2 rc=$?"
python -m demonet_tpu.train $COMMON $M --test-only \
    --resume runs/pelee_r5/checkpoint_15 > $D/pelee_testonly.log 2>&1
echo "pelee testonly rc=$?"

# ---- family 2: ssd_lite_mobilenet_v2 (BN trunk, v0 head) ----------------
M="--model ssd_lite_mobilenet_v2 --batch-size 32 --lr 0.02 --lr-steps 10 14
   --output-dir runs/sslv2_r5"
python -m demonet_tpu.train $COMMON $M --epochs 10 \
    > $D/sslv2_stage1.log 2>&1
echo "sslv2 stage1 rc=$?"
python -m demonet_tpu.train $COMMON $M --epochs 16 \
    --resume runs/sslv2_r5/checkpoint_9 > $D/sslv2_stage2.log 2>&1
echo "sslv2 stage2 rc=$?"
python -m demonet_tpu.train $COMMON $M --test-only \
    --resume runs/sslv2_r5/checkpoint_15 > $D/sslv2_testonly.log 2>&1
echo "sslv2 testonly rc=$?"

# ---- family 3: ssd512_vgg16 (no trunk BN -> the r4 lr-0.001 recipe) -----
M="--model ssd512_vgg16 --batch-size 16 --lr 0.001 --lr-steps 18 22
   --output-dir runs/vgg512_r5"
python -m demonet_tpu.train $COMMON $M --epochs 14 \
    > $D/vgg512_stage1.log 2>&1
echo "vgg512 stage1 rc=$?"
python -m demonet_tpu.train $COMMON $M --epochs 24 \
    --resume runs/vgg512_r5/checkpoint_13 > $D/vgg512_stage2.log 2>&1
echo "vgg512 stage2 rc=$?"
python -m demonet_tpu.train $COMMON $M --test-only \
    --resume runs/vgg512_r5/checkpoint_23 > $D/vgg512_testonly.log 2>&1
echo "vgg512 testonly rc=$?"
echo "ALL DONE"
