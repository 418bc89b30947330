"""messyerraytracer_tpu.accel"""
