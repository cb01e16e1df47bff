"""Numerical constants of the search engine.

(reference: alphadia/constants/settings.py:5-6)
"""

# number of hand-crafted features produced by candidate scoring
NUM_FEATURES = 46

# fragments with |mass error| above this (ppm) are treated as unmatched
MAX_FRAGMENT_MZ_TOLERANCE = 200

# sentinel mobility value for data without an ion-mobility dimension
# (reference: alphadia/raw_data/alpharaw_wrapper.py DEFAULT_VALUE_NO_MOBILITY)
NO_MOBILITY_VALUE = 1e-6

# intensity clamp / division guards of the weighted-mass accumulation
# (reference: alphadia/search/jitclasses/alpharaw_jit.py HIGH/LOW_EPSILON)
HIGH_EPSILON = 1e-26
LOW_EPSILON = 1e-36

# proton and isotope spacing masses (Da)
MASS_PROTON = 1.007276467
MASS_NEUTRON_AVG = 1.0033548378  # C13 - C12, the averagine isotope spacing

# fragment type codes (ASCII of the ion-series letter)
FRAGMENT_TYPE_A = 97
FRAGMENT_TYPE_B = 98
FRAGMENT_TYPE_C = 99
FRAGMENT_TYPE_X = 120
FRAGMENT_TYPE_Y = 121
FRAGMENT_TYPE_Z = 122

# seed of the optimization-lock elution-group shuffle
# (reference: alphadia/workflow/optimizers/optimization_lock.py:28-30)
OPTLOCK_SHUFFLE_SEED = 772
