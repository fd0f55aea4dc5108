# Developer tooling (the analog of the reference's tasks.py invoke targets,
# reference: tasks.py:5-93 config/build/run/clean).

.PHONY: test test-fast native bench render serve clean

test:
	python -m pytest tests/ -q

# fast tier: everything not marked `slow` (interpret-mode pallas kernels
# and heavy e2e runs) — oracle goldens, routing, scene CRUD, camera,
# viewer endpoint basics.  ~4-5 min vs ~40 min for the full gate.
test-fast:
	python -m pytest tests/ -q -m "not slow"

native:
	python -m cudaraytracer_tpu.native.build

bench:
	python bench.py

render:
	python -m cudaraytracer_tpu render --scene rtow_final --camera-model look_at \
	    --width 640 --height 360 -o render.png

serve:
	python -m cudaraytracer_tpu serve --scene default --width 640 --height 360

clean:
	rm -f cudaraytracer_tpu/native/libcrt_native.so render.png
	find . -name __pycache__ -type d -exec rm -rf {} +
