# Developer entry points. See CLAUDE.md for environment rules
# (one TPU job at a time; tests force an 8-device virtual CPU mesh).

.PHONY: test test-fast bench verify dryrun train-smoke

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" --ignore=tests/test_map.py

bench:
	python bench.py

verify:
	PYTHONPATH=$(PWD):$$PYTHONPATH python scratch/verify_tpu.py

dryrun:
	python __graft_entry__.py

train-smoke:
	python scripts/train_dlrm.py --steps 30 --batch 4096 --tables 8 \
	  --vocab 20000 --eval-every 30 --log-every 10
