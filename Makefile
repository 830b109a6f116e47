.PHONY: test test-fast bench lint

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q --ignore=tests/test_hs_suite.py \
	    --ignore=tests/test_batch.py

bench:
	python bench.py

lint:
	python -m compileall -q enlsip_tpu bench.py __graft_entry__.py
