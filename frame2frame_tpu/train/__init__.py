from .online import OnlineDenoiser, make_online_step, run_blind_denoising, torch_adam
