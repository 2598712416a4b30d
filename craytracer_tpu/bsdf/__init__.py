from craytracer_tpu.bsdf.bxdf import (  # noqa: F401
    MatParams,
    gather_params,
    bsdf_f_direct,
    bsdf_f_nodelta,
    bsdf_pdf,
    bsdf_pdf_balanced,
    bsdf_sample,
)
