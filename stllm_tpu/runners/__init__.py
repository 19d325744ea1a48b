from stllm_tpu.runners.runner_base import RunnerBase  # noqa: F401  (registration)
