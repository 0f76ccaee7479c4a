#!/bin/bash
# Round-2 SSL transfer experiment (VERDICT item 4): hard synthetic corpus,
# 400 images, 79/1-analog split (ratio=0.01 -> 4 fine-tune images, 80 test).
# scratch vs {spark, mae, cmunet} pretrained encoders, plus MLP probes.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
R=runs/transfer_r2
mkdir -p $R

# 1. corpus (host-side, ~5 min)
python - <<'EOF'
from cmx.data.synthetic import write_corpus
write_corpus("runs/hard400", n=400, size=256, seed=0, hard=True)
print("corpus done")
EOF

COMMON="data.data_dir=runs/hard400 data.ratio=0.01 train.ckpt_dir=$R/ckpt train.resume=False"

# 2. pretrains (reference-faithful presets, epochs scaled to corpus size)
python -m cmx.cli.pretrain --task spark --preset $COMMON \
  train.epochs=800 train.batch_size=64 task.pallas_loss=False \
  > $R/pretrain_spark.log 2>&1
python -m cmx.cli.pretrain --task mae --preset $COMMON \
  train.epochs=400 train.batch_size=64 \
  optim.name=sgd optim.lr=1e-2 optim.weight_decay=0.0 optim.clip_norm=None \
  > $R/pretrain_mae.log 2>&1
python -m cmx.cli.pretrain --task cmunet --preset $COMMON \
  train.epochs=400 train.batch_size=64 \
  > $R/pretrain_cmunet.log 2>&1

# 3. fine-tunes: scratch + each encoder (reference grid, batch 4 for the
#    4-image set), final retrain + held-out test
FT="data.data_dir=runs/hard400 data.ratio=0.01"
python -m cmx.cli.finetune --out $R/ft --batches 4 -- $FT \
  > $R/ft_scratch.log 2>&1
for t in spark mae cmunet; do
  python -m cmx.cli.finetune -p $R/ckpt/$t/encoder.npz --out $R/ft --batches 4 -- $FT \
    > $R/ft_$t.log 2>&1
done

# 4. probes on frozen encoders (MLP, SSLEvaluator-style)
for t in spark mae cmunet; do
  python -m cmx.cli.evaluate --encoder $R/ckpt/$t/encoder.npz --probe 512 -- $FT \
    > $R/probe_$t.log 2>&1
done
python -m cmx.cli.evaluate --probe 512 -- $FT > $R/probe_scratch.log 2>&1

echo ALL_DONE
