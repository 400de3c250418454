from .mel import (  # noqa: F401
    mel_filterbank,
    stft_magnitude,
    waveform_to_mel,
    mel_forward_chain,
    mel_inverse_chain,
    mel_to_stft,
    griffin_lim,
    mel_to_waveform,
    pad_or_trim,
)
from .sampling import top_k_logits, sample_logits  # noqa: F401
from .vq import vq_nearest_index, vq_lookup  # noqa: F401
