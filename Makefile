.PHONY: test bench bench-rna native dryrun entry clean

native:
	$(MAKE) -C csrc

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

bench-rna: native
	PAMNET_BENCH_TASK=rna python bench.py

entry:
	python __graft_entry__.py

dryrun:
	python __graft_entry__.py dryrun 8

clean:
	$(MAKE) -C csrc clean
	find . -name __pycache__ -type d -exec rm -rf {} +
