"""messyerraytracer_tpu.dispatch"""
