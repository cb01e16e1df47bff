"""Processing-step chain for library preparation.

(reference: alphadia/libtransform/base.py:9-61 — validate→forward pattern)
"""

from __future__ import annotations

from alphadia_tpu.reporting import logger


class ProcessingStep:
    def __call__(self, input_):
        if not self.validate(input_):
            raise ValueError(
                f"{self.__class__.__name__}: invalid input {type(input_).__name__}"
            )
        logger.info(f"Running library step {self.__class__.__name__}")
        return self.forward(input_)

    def validate(self, input_) -> bool:
        return True

    def forward(self, input_):
        raise NotImplementedError


class ProcessingPipeline:
    def __init__(self, steps: list[ProcessingStep]):
        self.steps = steps

    def __call__(self, input_):
        for step in self.steps:
            input_ = step(input_)
        return input_
