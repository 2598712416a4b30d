from craytracer_tpu.bsdf.bxdf import (  # noqa: F401
    MatParams,
    gather_params,
    bsdf_f_direct,
    bsdf_pdf,
    bsdf_sample,
)
