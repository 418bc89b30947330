"""messyerraytracer_tpu.debug"""
