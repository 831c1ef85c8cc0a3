.PHONY: test bench lint graft-check

test:
	python -m pytest tests/ -q

bench:
	python bench.py

graft-check:
	python __graft_entry__.py

lint:
	@if python -c "import ruff" 2>/dev/null || command -v ruff >/dev/null; then \
	  python -m ruff check shrimpy_tpu tests scripts bench.py __graft_entry__.py; \
	else \
	  echo "ruff unavailable; falling back to compileall"; \
	  python -m compileall -q shrimpy_tpu tests bench.py __graft_entry__.py; \
	fi
