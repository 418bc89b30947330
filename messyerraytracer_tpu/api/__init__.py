"""messyerraytracer_tpu.api"""
