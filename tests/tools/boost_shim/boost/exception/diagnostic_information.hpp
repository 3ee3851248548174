// Test-only shim; see all.hpp.
#ifndef TAXTK_SHIM_BOOST_EXCEPTION_DIAG_HPP
#define TAXTK_SHIM_BOOST_EXCEPTION_DIAG_HPP
#include "all.hpp"
#endif
