from a2m.audio import io, mel_np
from a2m.audio.frontend import (MelSpec, log_mel, log_mel_400, log_mel_512,
                                num_frames, silence_mask, spec_log_mel_400,
                                spec_log_mel_512, spec_vggish, vggish_log_mel)

__all__ = ['io', 'mel_np', 'MelSpec', 'log_mel', 'log_mel_400', 'log_mel_512',
           'num_frames', 'silence_mask', 'spec_log_mel_400',
           'spec_log_mel_512', 'spec_vggish', 'vggish_log_mel']
