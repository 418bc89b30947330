"""messyerraytracer_tpu.parallel"""
