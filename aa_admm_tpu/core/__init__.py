from .config import AccelType, Lame, Parameters, Settings
