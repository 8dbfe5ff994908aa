# Convenience targets. Everything also works as plain python -m invocations.

.PHONY: test bench native etl train sweep debug tune clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	bash native/build.sh

tune:
	python benchmarks/tune_tpu.py

train:
	python -m multimodal_emotion_detection_tpu.train --config configs/base.yaml $(ARGS)

sweep:
	python -m multimodal_emotion_detection_tpu.tools.sweep --config configs/base.yaml $(ARGS)

debug:
	python -m multimodal_emotion_detection_tpu.tools.debug $(ARGS)

etl:
	python -m multimodal_emotion_detection_tpu.data.ravdess $(ARGS)

clean:
	rm -rf outputs experiments analysis grid_sweep_results .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
