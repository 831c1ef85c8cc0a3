.PHONY: test bench lint graft-check

test:
	python -m pytest tests/ -q

bench:
	python bench.py

graft-check:
	python __graft_entry__.py

lint:
	@python -m ruff check shrimpy_tpu tests scripts bench.py __graft_entry__.py 2>/dev/null \
	  || (echo "ruff unavailable; falling back to compileall" && \
	      python -m compileall -q shrimpy_tpu tests bench.py __graft_entry__.py)
