from .elements import CollisionBatch, PinBatch, TetBatch, TriBatch
from .sdf import SdfScene, SdfSceneBuilder
