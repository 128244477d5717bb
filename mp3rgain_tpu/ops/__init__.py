"""Device DSP ops: equal-loudness IIR, RMS windowing, loudness histogram."""
