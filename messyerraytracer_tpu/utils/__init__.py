"""messyerraytracer_tpu.utils"""
