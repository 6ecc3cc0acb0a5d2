# Default config template — schema parity with the reference
# /root/reference/FourierGrid/configs/default.py (keys documented there).
# Values here only need to state deviations from
# unboundednerfpytorch_tpu.configs.schema defaults; the schema carries the
# full reference defaults.

expname = None
basedir = './logs/'
model = None

data = dict()
coarse_train = dict()
fine_train = dict()
coarse_model_and_render = dict()
fine_model_and_render = dict()
