from katago_tpu.distributed.client import Connection, ModelInfo, Task  # noqa: F401
