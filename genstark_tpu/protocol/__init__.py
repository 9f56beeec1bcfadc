from .proof import FriComponent, LowDegreeProof, StarkProof
from .stark import Assertion, Stark, StarkError
