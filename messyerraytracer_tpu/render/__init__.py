"""messyerraytracer_tpu.render"""
