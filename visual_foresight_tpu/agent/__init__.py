from .general_agent import (GeneralAgent, Bad_Traj_Exception, Image_Exception,
                            Environment_Exception)
