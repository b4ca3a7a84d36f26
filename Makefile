# Reproducible artifact builds for the visual_foresight_tpu framework.
#
#   make bench_model   rebuild the flagship predictor checkpoint from scratch
#                      (collect -> merge -> train; ~1 h collection on one CPU
#                      worker + ~12 min training on one TPU chip)
#   make bench         run the headline benchmark (restores the checkpoint,
#                      prints one JSON line)
#   make test          fast test suite
#
# Every path is env-overridable; defaults reproduce the EVAL.md / BENCH
# operating points exactly.

DATA_ROOT   ?= /root/data
FLAGSHIP    ?= $(DATA_ROOT)/models/xz_flagship
XZ_RECORDS  ?= $(DATA_ROOT)/collect/xz_r4/records
NTRAJ       ?= 1100

.PHONY: bench bench_model collect_flagship test

bench:
	python bench.py

# Step 1: 1100 random-policy xz-grasp trajectories (skipped if records exist)
collect_flagship:
	@if [ -d $(XZ_RECORDS)/good/train ] && [ -n "$$(ls $(XZ_RECORDS)/good/train 2>/dev/null)" ]; then \
	  echo "records exist at $(XZ_RECORDS); skipping collection"; \
	else \
	  VMPC_DATA_DIR=$(DATA_ROOT)/collect/xz_r4 bash scripts/collect_campaign.sh \
	    data_collection/sim/cartgripper_xz_grasp/r4_flagship/hparams.py \
	    $$(( $(NTRAJ) - 1 )) $(DATA_ROOT)/collect/xz_r4_collect.log; \
	fi

# Step 2+3: merge good+bad shards, train the space-to-depth flagship
# (exact EVAL.md round-4 recipe; checkpoint lands in $(FLAGSHIP)/view0)
bench_model: collect_flagship
	python scripts/merge_record_splits.py $(XZ_RECORDS)
	python -m visual_foresight_tpu.training.train_predictor \
	  --data_dir $(XZ_RECORDS)/all --model_dir $(FLAGSHIP) \
	  --steps 5000 --batch_size 32 --bf16 --std_factor 4 \
	  --enc_features 128 256 256 --lstm_kernel 3 --ss_k 300 --ckpt_every 1000

test:
	python -m pytest tests/ -x -q -m "not slow"
