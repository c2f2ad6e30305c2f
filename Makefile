# segclip_tpu developer shortcuts
.PHONY: test bench dryrun native clean-native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

native:
	python -c "from segclip_tpu.native.build import build; print(build())"

clean-native:
	rm -f segclip_tpu/native/segclip_native.so
