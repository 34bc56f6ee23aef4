from consistencytta_tpu.inference.generate import (
    GenerateConfig,
    build_generate_fn,
    build_guided_student_generate_fn,
    build_teacher_generate_fn,
)

__all__ = [
    "GenerateConfig",
    "build_generate_fn",
    "build_guided_student_generate_fn",
    "build_teacher_generate_fn",
]
