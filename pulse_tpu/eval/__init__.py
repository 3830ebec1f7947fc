from pulse_tpu.eval.im_eval import im_eval, EvalResult
