from .scheduler import (BatchFields, LayerSample, MinibatchIterator,
                        compute_importance, field_capacities, schedule)
